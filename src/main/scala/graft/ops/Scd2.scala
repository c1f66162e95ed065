package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history building: turn a change log
  * (key, event time, attributes) into versioned validity intervals —
  * the standard warehouse/lakehouse shape for point-in-time joins and
  * training-data snapshot reconstruction.
  *
  * One window specification (partition by key, order by event time + tie)
  * drives everything: change detection against the previous row
  * (null-safe, so NULL→value and value→NULL transitions version
  * correctly), interval close via lead over the surviving change rows,
  * version numbering, and the is_current flag. Two sorts per key total —
  * no self-joins, no per-row subqueries; shuffles hash on the key, so the
  * operator scales with keys × versions like any windowed aggregate.
  */
object Scd2 {

  /** Collapse a change log to SCD2 history rows.
    *
    * @param df          change log
    * @param keyCol      entity key
    * @param tsCol       event-time column (effective_from of a version)
    * @param tieCol      unique tie-break for same-timestamp events
    * @param trackedCols attributes whose change opens a new version;
    *                    consecutive rows with identical tracked values
    *                    collapse into one version
    * Output: key, tracked attrs, effective_from, effective_to (null =
    * open-ended), version (1-based per key), is_current.
    */
  def buildHistory(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, trackedCols: Seq[String]): DataFrame = {
    require(trackedCols.nonEmpty, "must track at least one attribute")
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    // null-safe "any tracked attribute differs from the previous row"; the
    // first row of a key always opens a version — detected positionally
    // (row_number = 1), NOT via lag(tieCol).isNull, which would also fire
    // on the row AFTER a null tie-break value and fabricate a version
    val changed = trackedCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val changes = df
      .withColumn("chg", changed)
      .filter(col("chg"))
      .drop("chg")
    val wv = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    changes
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(wv))
      .withColumn("version", row_number().over(wv).cast("int"))
      .withColumn("is_current", col("effective_to").isNull)
      .select((col(keyCol) +: trackedCols.map(col) :+
        col("effective_from") :+ col("effective_to") :+
        col("version") :+ col("is_current")): _*)
  }

  /** Point-in-time lookup against SCD2 history: the version of each key
    * valid at `at` (effective_from ≤ at < effective_to, open-ended current
    * rows match everything after their start).
    */
  def asOfVersion(history: DataFrame, at: Column): DataFrame =
    history.filter(col("effective_from") <= at &&
      (col("effective_to").isNull || col("effective_to") > at))
}
