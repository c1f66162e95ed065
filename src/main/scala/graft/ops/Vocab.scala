package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k vocabulary derivation — ONE definition of the vocab arithmetic
  * shared by the q49 build, q72 OOV statistics, and q94 tokenization (the
  * same drift-elimination rationale as [[Splits]]): frequency-ranked
  * whitespace tokens with the deterministic (n DESC, token ASC) total
  * order. Top-k runs FIRST (TakeOrderedAndProject — parallel per-partition
  * top-k, never a global sort of the token table); the rank window only
  * ever sees the ≤k survivors.
  */
object Vocab {

  /** (token, n, vocab_id 1..k) from a single-column `token` relation of
    * exploded tokens (empty tokens excluded).
    */
  def topK(tokens: DataFrame, k: Int): DataFrame =
    tokens
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .withColumn("vocab_id", row_number().over(
        Window.orderBy(col("n").desc, col("token"))).cast("int"))
}
