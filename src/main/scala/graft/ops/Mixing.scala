package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-scaled source mixing — the standard multilingual/multi-source
  * LM recipe (sampling weight ∝ n_s^τ, τ < 1 upweights small sources) made
  * DETERMINISTIC: instead of drawing docs at random, each doc's md5-derived
  * uniform u ∈ [0,1) is compared against its source's acceptance rate, so
  * the mix is reproducible on any engine, partition-invariant, and stable
  * under corpus growth (a doc's fate depends only on its id and its
  * source's aggregate count).
  *
  * Scale shape: one partial+final count per source (tiny result), a
  * driver-free broadcast join of the per-source rates back onto the
  * corpus, and a codegen'd projection+filter — the corpus is scanned
  * once and never shuffled.
  *
  * Exactness: τ is fixed at 0.5 because IEEE-754 `sqrt`, `*`, `/` are
  * correctly rounded — Spark and any oracle engine computing the same
  * expression tree get bit-identical rates, so threshold comparisons
  * can't flip across engines (a general `pow(x, 0.7)` carries no such
  * guarantee). The uniform u = (first 8 md5 nibbles) / 2^32 is exact in
  * a double.
  */
object Mixing {

  /** Uniform-in-[0,1) hash of an id column (md5 → 32 bits → /2^32). */
  def unitHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Per-source acceptance rates for a √-temperature mix targeting
    * `targetDocs` accepted docs in expectation: w_s = √n_s,
    * rate_s = min(1, targetDocs · w_s / Σw / n_s).
    * Returns (srcCol, n_docs, rate).
    *
    * Σw is the one cross-row float reduction — summed as DECIMAL(28,10)
    * (per-row rounded once, then exact) so the result is order-invariant
    * under any partitioning; every other step is a correctly-rounded
    * scalar op on identical inputs.
    */
  def sqrtTemperatureRates(docs: DataFrame, srcCol: String,
      targetDocs: Long): DataFrame = {
    val counts = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val total = counts.agg(
      sum(sqrt(col("n_docs")).cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast("double").as("sum_w"))
    counts.crossJoin(broadcast(total))
      .select(col(srcCol), col("n_docs"),
        least(lit(1.0),
          lit(targetDocs.toDouble) * sqrt(col("n_docs")) / col("sum_w")
            / col("n_docs")).as("rate"))
  }

  /** The mixed corpus: docs whose unit hash clears their source's rate.
    * Output = input columns + (n_docs, rate, u).
    */
  def sqrtTemperatureSample(docs: DataFrame, idCol: String, srcCol: String,
      targetDocs: Long): DataFrame = {
    val rates = sqrtTemperatureRates(docs, srcCol, targetDocs)
    docs.join(broadcast(rates), srcCol)
      .withColumn("u", unitHash(col(idCol)))
      .filter(col("u") < col("rate"))
  }
}
