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

  /** Multi-aggregate form of [[saltedAgg]]: several (partial, merge)
    * semigroup pairs in the same two passes. `partials` aggregate over
    * (key, salt); `merges` (keyed by the SAME output names) combine the
    * partials per key. Results equal the direct single-pass groupBy for
    * any semigroup aggregates (count+sum, sum+sum, min+min, max+max).
    */
  def saltedAggMulti(df: DataFrame, key: String, saltFromCol: String, nSalt: Int,
      partials: Seq[(String, org.apache.spark.sql.Column)],
      merges: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(partials.nonEmpty && partials.map(_._1) == merges.map(_._1),
      "partials and merges must align by name")
    val staged = df.withColumn("__salt",
        pmod(xxhash64(col(saltFromCol)), lit(nSalt)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    staged.groupBy(col(key))
      .agg(merges.head._2.as(merges.head._1),
        merges.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
