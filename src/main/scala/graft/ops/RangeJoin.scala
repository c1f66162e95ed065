package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins — the operator class Spark's equi-join machinery
  * doesn't cover: pairs within a numeric/temporal distance, or points in
  * intervals, with NO equality key to hash on. The naive plan is a
  * broadcast-nested-loop (O(n·m) comparisons) — unusable at scale.
  *
  * Implementation: BIN BUCKETING. Quantize the range dimension into bins of
  * the window width; the probe side fans out to its bin and both adjacent
  * bins (any in-range partner must land there), the build side keeps its one
  * home bin, and the join becomes an EQUI-join on the bin id that Catalyst
  * plans as a hash join — sharded by bin across the cluster. The exact
  * predicate filters the bin-collision false positives. Candidate volume is
  * n·(local density) instead of n·m, and the shuffle key (the bin) spreads
  * uniformly when the data does; a skewed hot bin responds to the standard
  * salting in [[Skew]].
  *
  * Pair uniqueness: the build row has exactly ONE home bin and each probe
  * row emits each candidate bin once, so a qualifying pair meets exactly
  * once — no post-join dedup pass.
  */
object RangeJoin {

  /** All (probe, build) pairs with |probeTs − buildTs| ≤ `window`. The
    * math is unit-agnostic: `tsCol` and `window` just need the SAME unit
    * (seconds, micros, …) — the callers here pass epoch-micros.
    * Output columns: probe's prefixed `p_*`, build's `b_*`.
    *
    * @param probe    rows seeking partners (each output row keys back to it)
    * @param build    rows offered as partners
    * @param tsCol    numeric time column name, present in both inputs
    * @param window   max |Δt|, in `tsCol`'s unit (also the bin width)
    */
  def withinTime(probe: DataFrame, build: DataFrame, tsCol: String,
      window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    val pPref = probe.columns.map(c => col(c).as(s"p_$c"))
    val bPref = build.columns.map(c => col(c).as(s"b_$c"))
    val p = probe.select(pPref.toIndexedSeq: _*)
    val b = build.select(bPref.toIndexedSeq: _*)

    // home bin on the build side; the probe explodes to bin−1, bin, bin+1 —
    // any partner within the window lives in one of those (bin width =
    // window, so a gap ≤ window spans at most one bin boundary).
    val bBinned = b.withColumn("bin", floor(col(s"b_$tsCol") / window))
    val pBinned = p.withColumn("bin",
      explode(array(floor(col(s"p_$tsCol") / window) - 1,
        floor(col(s"p_$tsCol") / window),
        floor(col(s"p_$tsCol") / window) + 1)))

    pBinned.join(bBinned, Seq("bin"))
      .filter(abs(col(s"p_$tsCol") - col(s"b_$tsCol")) <= window)
      .drop("bin")
  }

  /** Point-in-interval join: each probe point matched to build intervals
    * [startCol, endCol] containing it. Intervals are exploded to every bin
    * they overlap (cost ∝ interval length / bin width — choose `binWidth`
    * near the TYPICAL interval length so most intervals touch O(1) bins);
    * points keep their single home bin.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pPref = points.columns.map(c => col(c).as(s"p_$c"))
    val iPref = intervals.columns.map(c => col(c).as(s"i_$c"))
    val p = points.select(pPref.toIndexedSeq: _*)
      .withColumn("bin", floor(col(s"p_$pointCol") / binWidth))
    val i = intervals.select(iPref.toIndexedSeq: _*)
      .withColumn("bin", explode(sequence(
        floor(col(s"i_$startCol") / binWidth),
        floor(col(s"i_$endCol") / binWidth))))
    p.join(i, Seq("bin"))
      .filter(col(s"p_$pointCol").between(col(s"i_$startCol"), col(s"i_$endCol")))
      .drop("bin")
  }
}
