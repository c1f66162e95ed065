package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) statistics for data cleaning.
  *
  * Two tiers, same shape (two grouped percentile passes + broadcast joins
  * back onto the rows — never a sort of the full table):
  *
  *  - EXACT (`exact = true`): `percentile` holds every group value in the
  *    ObjectHashAggregate buffer. Right answer, and the right choice while
  *    group cardinality × group size stays executor-sized — it is also the
  *    oracle-checkable tier (q62).
  *  - APPROX (`exact = false`): `percentile_approx` (Greenwald-Khanna
  *    style sketch, `accuracy` knob) is mergeable with bounded memory per
  *    group regardless of group size — the 100 TB default, where a single
  *    hot group's exact buffer is the textbook OOM. Error is bounded by
  *    1/accuracy of rank, spec-pinned against the exact tier.
  */
object Robust {

  private def pct(exact: Boolean, accuracy: Int): Column =
    if (exact) F.expr("percentile(__robust_v, 0.5)")
    else percentile_approx(col("__robust_v"), lit(0.5), lit(accuracy))

  /** Rows of `df` annotated with the per-`keyCol` median (`med`), median
    * absolute deviation (`mad`), and an `is_outlier` flag at
    * |x − med| > nSigmas·mad.
    */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
      nSigmas: Double = 3.0, exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    val v = df.withColumn("__robust_v", col(valCol))
    val med = v.groupBy(keyCol)
      .agg(pct(exact, accuracy).as("med"))
    val withMed = v.join(F.broadcast(med), keyCol)
      .withColumn("__robust_v", abs(col(valCol) - col("med")))
    val mad = withMed.groupBy(keyCol)
      .agg(pct(exact, accuracy).as("mad"))
    withMed.drop("__robust_v")
      .join(F.broadcast(mad.select(col(keyCol), col("mad"))), keyCol)
      .withColumn("is_outlier",
        abs(col(valCol) - col("med")) > col("mad") * nSigmas)
  }

  /** Scale-safe equi-depth bucketing: `ntile(k)` sorts each key's whole
    * partition through its task — a near-global sort when keys are few and
    * groups are huge. This variant computes k−1 approximate quantile
    * boundaries per key (a bounded-memory, mergeable aggregate), broadcasts
    * the tiny boundary table, and assigns each row's bucket map-side by
    * counting boundaries below its value (a plain comparison chain — stays
    * inside whole-stage codegen, no interpreted lambda on the hot path).
    * No sort of the data anywhere.
    *
    * Semantics: bucket edges are VALUE cutpoints, so equal values always
    * share a bucket — approximately equi-depth when values are
    * near-distinct (within the sketch's rank error), but a heavily tied
    * column collapses its ties into one bucket (an equi-depth split of a
    * constant column is ill-defined; `ntile`'s row-rank split is the tier
    * for that). Rows whose key or value is NULL are kept with a NULL
    * bucket (left join; `ntile` would rank them — callers pick the
    * treatment).
    */
  def equiDepthBuckets(df: DataFrame, keyCol: String, valCol: String,
      k: Int, accuracy: Int = 10000): DataFrame = {
    require(k >= 2, "need at least 2 buckets")
    val probs = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val bounds = df.groupBy(keyCol)
      .agg(percentile_approx(col(valCol), probs, lit(accuracy)).as("bounds"))
    val bucket = (0 until k - 1)
      .map(i => (col(valCol) > col("bounds")(i)).cast("int"))
      .reduce(_ + _) + 1
    df.join(F.broadcast(bounds), Seq(keyCol), "left")
      .withColumn("bucket", bucket.cast("int"))
      .drop("bounds")
  }
}
