package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog as RELATIONS, not binary blobs: the sketch state is
  * (group, register index, register value) rows, built with the same
  * md5-head hash discipline as the q52 sampling tier so a SECOND ENGINE
  * can reprice every register — the property Spark's built-in
  * `approx_count_distinct` / DataSketches surfaces cannot offer (their
  * sketch bytes are engine-internal, which is exactly why q51/q60 spent
  * rounds 9-15 as rows-only checks).
  *
  * Shape: p = 12 (4096 registers), h = first 60 bits of md5 (the 15-hex
  * `conv` both engines parse identically), idx = h mod 4096, w = h div
  * 4096 (48 bits), rho = 49 - bitlength(w) (49 when w = 0). Estimates
  * use the integer-exact register sum Σ 2^(49 - rho) — a BIGINT, so the
  * harmonic-mean denominator carries NO floating-point summation-order
  * wiggle — with linear counting below 2.5m (the standard HLL regime
  * split). The only cross-engine float step left is one `ln` in the
  * linear-counting branch, absorbed by the 4-decimal quantization the
  * readouts emit.
  *
  * Scale shape: register rows partial-aggregate (groupBy max is
  * map-side combinable), a group's full sketch is ≤ 4096 tiny rows on
  * the wire regardless of input size, and day→month merges are plain
  * `max` re-aggregation over stored register rows — the mergeable
  * pre-aggregation pattern that makes 100 TB rollups incremental,
  * expressed in the engine's own algebra instead of an opaque blob.
  */
object RelationalHll {

  val P = 12
  val M = 4096
  /** 2^49 as a double-safe long: the register-sum unit for rho = 0. */
  val Unit49 = 562949953421312L

  /** The 60-bit cross-engine hash of a value (md5 head, q52's trick). */
  def hash60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("long")

  /** Register rows: one (groupCols*, idx, rho) per input row — feed to
    * [[registers]] to fold, or store day-grained and re-fold for any
    * coarser period.
    */
  def registerRows(df: DataFrame, groupCols: Seq[String],
      value: Column): DataFrame = {
    val h = hash60(value)
    val w = shiftright(h, P)
    df.select(groupCols.map(col) ++ Seq(
      pmod(h, lit(M.toLong)).as("idx"),
      when(w === 0L, lit(49)).otherwise(lit(49) - length(bin(w)))
        .cast("int").as("rho")): _*)
  }

  /** Fold register rows to sketch state: max rho per (group, idx). */
  def registers(rows: DataFrame, groupCols: Seq[String]): DataFrame =
    rows.groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /** Per-group estimate from folded registers: `approx_distinct`
    * (BIGINT, floor of the HLL/linear-counting estimate), plus the
    * EXACT integer sketch fingerprint (`reg_sum` = Σ 2^(49-rho) over
    * all 4096 registers, `v_zero` = empty-register count) so the
    * oracle pins the full register state, not only the rounded
    * readout.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val folded = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftright(${Unit49}L, rho)")).as("present_sum"))
      .withColumn("v_zero", lit(M.toLong) - col("n_regs"))
      .withColumn("reg_sum",
        col("present_sum") + col("v_zero") * lit(Unit49))
    // alpha_m * m^2 * 2^49 / reg_sum, every factor literal-identical in
    // both engines; linear counting m*ln(m/V) below 2.5m when V > 0
    val raw = lit(0.7213 / (1.0 + 1.079 / 4096.0)) * lit(4096.0) *
      lit(4096.0) * lit(Unit49.toDouble) / col("reg_sum").cast("double")
    val est = when(raw <= lit(10240.0) && col("v_zero") > 0L,
      lit(4096.0) * log(lit(4096.0) / col("v_zero").cast("double")))
      .otherwise(raw)
    folded.select(groupCols.map(col) ++ Seq(
      floor(est).cast("long").as("approx_distinct"),
      col("reg_sum").cast("long").as("reg_sum"),
      col("v_zero").cast("long").as("v_zero")): _*)
  }

  /** The matching DuckDB arithmetic, parameterized on a rows-CTE named
    * `hrows(gcols..., idx, rho)` — keeps the two engines' formulas in
    * ONE source file so they cannot drift apart silently.
    */
  def oracleEstimateSql(gcols: Seq[String]): String = {
    val g = gcols.mkString(", ")
    s"""hregs AS (
       |  SELECT $g, idx, max(rho) AS rho FROM hrows GROUP BY $g, idx),
       |hfold AS (
       |  SELECT $g, count(*) AS n_regs,
       |    sum(562949953421312 // (CAST(1 AS BIGINT) << rho))
       |      AS present_sum
       |  FROM hregs GROUP BY $g),
       |hest AS (
       |  SELECT $g,
       |    4096 - n_regs AS v_zero,
       |    present_sum + (4096 - n_regs) * 562949953421312 AS reg_sum,
       |    (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
       |      * 562949953421312.0
       |      / CAST(present_sum + (4096 - n_regs) * 562949953421312
       |             AS DOUBLE) AS raw
       |  FROM hfold),
       |hout AS (
       |  SELECT $g,
       |    CAST(floor(CASE WHEN raw <= 10240.0 AND v_zero > 0
       |      THEN 4096.0 * ln(4096.0 / CAST(v_zero AS DOUBLE))
       |      ELSE raw END) AS BIGINT) AS approx_distinct,
       |    CAST(reg_sum AS BIGINT) AS reg_sum,
       |    CAST(v_zero AS BIGINT) AS v_zero
       |  FROM hest)""".stripMargin
  }

  /** The rows-CTE the oracle pairs with [[oracleEstimateSql]]: idx/rho
    * from the same md5-head arithmetic, over `table`.`valueExpr`.
    */
  def oracleRowsSql(gcolsExpr: String, valueExpr: String,
      table: String): String =
    s"""hrows AS (
       |  SELECT $gcolsExpr, h % 4096 AS idx,
       |    CASE WHEN h // 4096 = 0 THEN 49
       |         ELSE 49 - length(bin(h // 4096)) END AS rho
       |  FROM (SELECT *,
       |          CAST(CAST(('0x' || substr(md5(CAST($valueExpr AS VARCHAR)),
       |            1, 15)) AS UBIGINT) AS BIGINT) AS h
       |        FROM $table))""".stripMargin
}
