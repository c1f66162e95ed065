package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup operators.
  *
  * Reference: `DISTINCT ON (job_id)` at
  * /root/reference/airflow/dags/sql/scrape_url_dedupe_jobs.sql:1-8 keeps one
  * arbitrary row per key (no ORDER BY). `dropDuplicates` has the same
  * semantics; `firstRowPerKey` is the deterministic variant (row_number over
  * an explicit ordering), which is what an oracle-checked engine should
  * prefer.
  *
  * Scale notes: both forms are a single hash-shuffle on the key columns.
  * `dropDuplicates` plans partial+final Aggregate (map-side combine prunes
  * duplicates before the shuffle); `firstRowPerKey` is a shuffle + per-group
  * sort but never materializes a full sort of the table.
  */
object Dedupe {

  /** One arbitrary row per key — DISTINCT ON semantics. */
  def arbitraryRowPerKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic first-row-per-key: the row that sorts first by
    * `order` within each key group wins.
    */
  def firstRowPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
