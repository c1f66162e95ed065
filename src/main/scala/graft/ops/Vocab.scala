package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k vocabulary derivation — ONE definition of the vocab arithmetic
  * shared by the q49 build, q72 OOV statistics, and q94 tokenization (the
  * same drift-elimination rationale as [[Splits]]): frequency-ranked
  * whitespace tokens with the deterministic (n DESC, token ASC) total
  * order. Top-k runs FIRST (TakeOrderedAndProject — parallel per-partition
  * top-k, never a global sort of the token table); the rank only ever sees
  * the ≤k survivors, and is the two-level [[globalRank]] — a million-entry
  * vocab never funnels through one task.
  */
object Vocab {

  private val vocabOrder = Seq(col("n").desc, col("token"))

  /** The lazy ≤k survivor relation (token, n) — exposed so PlanSpec can
    * assert the TakeOrderedAndProject shape, which [[topK]]'s
    * materialization otherwise hides behind a checkpoint scan.
    */
  private[graft] def survivors(tokens: DataFrame, k: Int): DataFrame =
    survivorsFromCounts(
      tokens
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("n")),
      k)

  private def survivorsFromCounts(counts: DataFrame, k: Int): DataFrame =
    counts.orderBy(vocabOrder: _*).limit(k)

  /** (token, n, vocab_id 1..k) from a single-column `token` relation of
    * exploded tokens (empty tokens excluded). The survivor set is
    * materialized ONCE (k rows — cheap to pin at any scale) so the full
    * corpus aggregation never re-executes for the rank's offset pass.
    */
  def topK(tokens: DataFrame, k: Int): DataFrame =
    globalRank(Materialize(survivors(tokens, k)), vocabOrder, "vocab_id")

  /** [[topK]] against an ALREADY-COUNTED (token, n) relation — the
    * serve-from-state entry point (q142 ranks the stored word dict a
    * `trackMerges` state maintains incrementally; the corpus-scale
    * aggregate never re-runs).
    */
  def topKFromCounts(counts: DataFrame, k: Int): DataFrame =
    globalRank(Materialize(survivorsFromCounts(counts, k)), vocabOrder,
      "vocab_id")

  /** Global dense row-number over `order` WITHOUT an unpartitioned window
    * (`row_number().over(Window.orderBy(...))` funnels the whole relation
    * through ONE task — the scale killer for a real vocab). Two-level
    * instead, the [[Packing]] hierarchical pattern applied to ranking:
    *
    *   1. range-shard on the sort key (`repartitionByRange`: sampled
    *      boundaries, so shard i's keys all precede shard i+1's);
    *   2. rank within each shard via a PARTITIONED window — parallel
    *      across shards, each task sorts ~rows/shards rows;
    *   3. per-shard row counts (`shards` scalars) → driver prefix-sum →
    *      broadcast back as a map literal: global rank =
    *      shard base + local rank.
    *
    * Deterministic for any boundary draw because shards partition the
    * SORTED order: moving a boundary moves rows between shards but never
    * changes base+local. The range exchange is MATERIALIZED once
    * (eager `localCheckpoint`) and feeds both the offset collect and
    * the result, so the two reads cannot see different sampled
    * boundaries — the single-evaluation contract is structural, not a
    * caller obligation (inputs here are vocab-scale, so the pinned
    * copy is small). A shard somehow absent from the collected bases
    * fails loudly rather than silently colliding ranks at base 0.
    * Scales as O(rows/shards) per task plus an O(shards) driver step.
    */
  def globalRank(df: DataFrame, order: Seq[Column], outCol: String,
      shards: Int = 32): DataFrame = {
    val sharded = df.repartitionByRange(shards, order: _*)
      .withColumn("_shard", spark_partition_id())
      .localCheckpoint()
    val counts = sharded.groupBy("_shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val bases: Map[Int, Long] = counts.map { case (sh, c) =>
      val b = sh -> acc; acc += c; b
    }.toMap
    val wLocal = Window.partitionBy(col("_shard")).orderBy(order: _*)
    val base = element_at(typedLit(bases), col("_shard"))
    sharded
      .withColumn("_local", row_number().over(wLocal))
      .withColumn(outCol,
        (when(base.isNull, raise_error(concat(
            lit("globalRank: shard "), col("_shard").cast("string"),
            lit(" missing from collected bases")))).otherwise(base) +
          col("_local")).cast("int"))
      .drop("_shard", "_local")
  }
}
