package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Data-quality assertion aggregates.
  *
  * Reference: the `SQLColumnCheckOperator` sanity gate —
  * uniqueness (`count - count(distinct)` == 0), min/max date range, and
  * zero-null checks (/root/reference/airflow/dags/scrape_url.py:424-436),
  * plus the fail-on-empty guard (scrape_url.py:276-277).
  *
  * All checks compute in ONE pass over the data (a single aggregate row),
  * not one job per check — at 100 TB each extra pass is a full table scan.
  */
object Quality {

  /** One-row DataFrame of quality metrics for the given columns. */
  def metrics(df: DataFrame, uniqueCol: String, notNullCol: String, rangeCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      (count(col(uniqueCol)) - countDistinct(col(uniqueCol))).as("dup_keys"),
      sum(when(col(notNullCol).isNull, 1L).otherwise(0L)).as("n_nulls"),
      min(col(rangeCol)).as("range_min"),
      max(col(rangeCol)).as("range_max"))

  final case class Report(nRows: Long, dupKeys: Long, nNulls: Long)

  /** Evaluate the gate; throws IllegalStateException (like the reference's
    * raise) when an invariant is violated.
    */
  def enforce(df: DataFrame, uniqueCol: String, notNullCol: String, rangeCol: String,
      rangeMin: Any, rangeMax: Any): Report = {
    val r: Row = metrics(df, uniqueCol, notNullCol, rangeCol).head()
    val nRows = r.getLong(0)
    val dups = r.getLong(1)
    val nulls = if (r.isNullAt(2)) 0L else r.getLong(2)
    if (nRows == 0) throw new IllegalStateException("empty input")
    if (dups != 0) throw new IllegalStateException(s"$dups duplicate keys in $uniqueCol")
    if (nulls != 0) throw new IllegalStateException(s"$nulls nulls in $notNullCol")
    val lo = r.get(3)
    val hi = r.get(4)
    // A mis-typed bound must fail the gate loudly, not disable the check:
    // returning false here would report success on data that was never
    // validated (e.g. TimestampType column vs java.sql.Date bound).
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (null, _) | (_, null) => false
      case (x: Comparable[Any] @unchecked, y) =>
        try x.compareTo(y) < 0
        catch {
          case e: ClassCastException => throw new IllegalArgumentException(
            s"range check on $rangeCol: ${a.getClass.getName} is not " +
              s"comparable to ${b.getClass.getName}", e)
        }
      case _ => throw new IllegalArgumentException(
        s"range check on $rangeCol: ${a.getClass.getName} is not " +
          s"comparable to ${b.getClass.getName}")
    }
    if (lt(lo, rangeMin)) throw new IllegalStateException(s"$rangeCol min $lo < $rangeMin")
    if (lt(rangeMax, hi)) throw new IllegalStateException(s"$rangeCol max $hi > $rangeMax")
    Report(nRows, dups, nulls)
  }
}
