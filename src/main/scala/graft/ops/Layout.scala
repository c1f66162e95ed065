package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the lake
  * layout that makes min/max file skipping work on MORE THAN ONE predicate
  * column. A table range-sorted on one key prunes scans on that key only;
  * interleaving the bits of k quantized keys gives a 1-D sort order whose
  * contiguous ranges are k-D hyper-rectangles, so every file's min/max
  * footer stays narrow on EVERY interleaved dimension at once. At 100 TB
  * that is the difference between "prune on ship-date" and "prune on
  * ship-date AND price AND region" from the same physical copy.
  *
  * The quantization contract is the caller's: inputs to [[zValue]] are
  * already-quantized NON-NEGATIVE longs below 2^bits (equi-width ranks,
  * integer day offsets, dictionary codes...). Keeping quantization outside
  * the interleave keeps this exact and engine-portable — bit surgery only,
  * no floats.
  */
object Layout {

  /** Morton interleave of pre-quantized dims: bit i of dim j lands at
    * position i·k + j. Pure shift/mask arithmetic — codegen-friendly,
    * 2·bits·k long ops per row, no allocation.
    */
  def zValue(bits: Int, dims: Column*): Column = {
    require(dims.nonEmpty && bits > 0 && bits * dims.size <= 62,
      s"bits=$bits × ${dims.size} dims must fit a positive long")
    val k = dims.size
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (d, j) =>
        shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ + _)
  }

  /** Write-side clustering: range-partition by the z-value into
    * `numFiles` output tasks and sort within each — every output file
    * then covers one contiguous z-range = one hyper-rectangle. The sort
    * is per-partition (no global sort barrier beyond the range
    * exchange's sampling pass, which AQE already pays for any
    * repartitionByRange).
    */
  def clusterByZ(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
}
