package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE rebalances skewed SHUFFLE joins at runtime, but two patterns still
  * need explicit salting at 100 TB:
  *
  *  - hot-key joins where one side must be replicated (AQE splits
  *    partitions, not keys, when the hot key exceeds a single partition);
  *  - high-cardinality-per-key aggregations whose per-key state would
  *    overflow one task.
  *
  * Both transforms are deterministic (salt = hash of stable columns, not
  * rand()), so results stay reproducible and oracle-checkable.
  */
object Skew {

  /** Equi-join where `left` may carry heavily skewed keys: left rows get a
    * deterministic salt in [0, nSalt) from their own content; the right
    * side is replicated nSalt×. Result equals a plain inner equi-join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFrom: Seq[String], nSalt: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(nSalt)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage aggregation for skewed groupBy keys: partial aggregate on
    * (key, salt), final aggregate on key. `partial` and `merge` must form
    * a semigroup (e.g. sum/sum, count/sum, min/min, max/max).
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      nSalt: Int,
      partial: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      merge: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(valueCol)), lit(nSalt)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial(col(valueCol)).as("__p"))
      .groupBy(col(key))
      .agg(merge(col("__p")).as(s"agg_$valueCol"))
}
