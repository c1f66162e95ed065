package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent-ingest patterns.
  *
  * The reference guarantees re-runnability with
  * `INSERT ... ON CONFLICT DO NOTHING` on a unique key
  * (/root/reference/airflow/dags/sql/scrape_url_insert_data.sql:1-4) and
  * "new rows only" anti-joins against a processed ledger
  * (/root/reference/spark/ParseHtml.py:26-31,
  * /root/reference/airflow/dags/sql/scrape_url_create_scraped_job_table.sql:10-15).
  * Spark has no in-place mutation, so both become left-anti joins composed
  * with an append (or a dedup over the union for full-rebuild sinks).
  *
  * Scale notes: the ledger side of the anti-join is usually the smaller
  * projection (just the key columns) — Catalyst broadcasts it when under the
  * autoBroadcast threshold; otherwise it is a shuffled left-anti hash join,
  * AQE-converted back to broadcast at runtime if the key set turns out small.
  */
object Ledger {

  /** Rows of `incoming` whose key is absent from `existing` — the
    * `ON CONFLICT DO NOTHING` / NOT-IN-subquery operator. SQL `NOT IN` is
    * null-aware; callers must guarantee non-null keys (they are PKs in the
    * reference), which makes left_anti semantically identical.
    */
  def newRowsOnly(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** Idempotent set-insert realized as a full rebuild: union then keep one
    * row per key, preferring existing rows (matches ON CONFLICT DO NOTHING,
    * where the incumbent row survives).
    */
  def upsertPreferExisting(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(newRowsOnly(incoming, existing, keys))
}
