package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator vanilla Spark lacks.
  *
  * Preference order from SURVEY §4.2 applied: this is case (a) — the
  * semantics ARE expressible by composing built-ins, via the classic
  * union-and-window technique, so no custom LogicalPlan/Strategy is
  * justified. For each left row, find the right row with the greatest
  * timestamp ≤ the left timestamp within the same key:
  *
  *   1. union both sides tagged left/right;
  *   2. one window per key ordered by (ts, rightness, id) carries the
  *      last-seen right row forward (`last(_, ignoreNulls)`);
  *   3. keep left rows.
  *
  * Scale: ONE shuffle on the key and one per-partition sort — no range
  * cross-product, no per-row probing; state is a single running value.
  * Ties (equal ts) resolve right-row-first (a right row AT the left ts is
  * eligible), then larger right id — deterministic everywhere.
  */
object AsOf {

  /** @param left      probe side; columns `keyCol`, `tsCol`, `leftIdCol`
    * @param right     reference side; columns `keyCol`, `tsCol`, `rightIdCol`
    * @return one row per left row: (key, leftId, ts, matched right id, matched right ts)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      leftIdCol: String, rightIdCol: String): DataFrame = {
    // mirror the RIGHT side's actual types — hard casts would throw under
    // ANSI (string ids) or silently null out matches
    val ridType = right.schema(rightIdCol).dataType
    val rtsType = right.schema(tsCol).dataType
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(leftIdCol).as("lid"),
      lit(null).cast(ridType).as("rid"), lit(null).cast(rtsType).as("rts"),
      lit(0).as("is_right"))
    val r = right
      .filter(col(tsCol).isNotNull) // a null-ts right row is never "before" anything
      .select(col(keyCol).as("k"), col(tsCol).as("ts"),
        lit(null).cast(left.schema(leftIdCol).dataType).as("lid"),
        col(rightIdCol).as("rid"), col(tsCol).as("rts"),
        lit(1).as("is_right"))
    // right rows sort before left rows at equal ts (eligible), and among
    // equal-ts right rows the largest id lands last (wins last()); the
    // match travels as ONE struct so id and ts can never come from
    // different right rows
    val w = Window.partitionBy("k")
      .orderBy(col("ts"), col("is_right").desc, col("rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m",
        last(when(col("is_right") === 1, struct(col("rid"), col("rts"))),
          ignoreNulls = true).over(w))
      .filter(col("is_right") === 0)
      .select(col("k").as(keyCol), col("lid").as(leftIdCol), col("ts").as(tsCol),
        col("m.rid").as("matched_id"), col("m.rts").as("matched_ts"))
  }
}
