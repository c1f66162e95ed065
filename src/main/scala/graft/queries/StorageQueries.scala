package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** Round-6 storage surface: the file-format sinks exercised through a real
  * write → independent read-back, oracle-checked — closing the "sources
  * are spec-only" asterisk from the round-5 coverage table. The reference
  * moves every table through CSV staging files
  * (/root/reference/airflow/dags/export_to_csv.py:12-26), so the CSV
  * contract (no header, no quoting of plain fields, nullValue = "" and
  * emptyValue = "") is the part of the storage surface worth proving
  * against a second engine's parser, not just a Spark self-read.
  */
object StorageQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The directory the oracle SQL reads — RUN-SCOPED by the writing
    * JVM's pid, so two concurrent harness runs on one host can never
    * read each other's bytes or race a mid-overwrite directory. The
    * oracle stays consistent because the SQL string is interpolated from
    * this same value in this same JVM: the Spark side writes the files
    * during the query, and the harness dumps the oracle SQL (with the
    * identical pid-scoped path) before handing it to DuckDB.
    */
  val csvRoundtripDir =
    s"/tmp/graft_q104_csv_${ProcessHandle.current().pid()}"

  /** q104 — CSV sink → source round-trip on the documents table: project
    * (doc_id, lang2, source, n_chars) where lang2 is NULL for 'de' rows
    * (exercising nullValue) and '' for doc_id % 7 == 0 rows (exercising
    * emptyValue), write through the S3/S5 CSV contract, read back through
    * the S4 schema-enforced CSV read. Both writer conventions collapse to
    * the empty field on disk, and both engines' readers (Spark's default
    * nullValue "", DuckDB's nullstr '') lift the empty field back to
    * NULL — so the round-trip is digest-stable across engines, which is
    * exactly the property an export/ingest seam must have. The text
    * column stays out: free-text quoting is a parser-parity minefield the
    * reference's unquoted-plain-fields contract never enters.
    *
    * Scale shape: the write is a parallel multi-part CSV dump (no
    * coalesce — S5's single-file funnel is for report-sized exports); the
    * read-back is schema-enforced (single pass, no inference).
    */
  val q104_csv_roundtrip: Q = (s, d) => {
    val out = Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit(""))
          .otherwise(nullif(col("lang"), lit("de"))).as("lang2"),
        col("source"), col("n_chars"))
    Sources.writeCsv(out, csvRoundtripDir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang2", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    Sources.readCsv(s, schema, csvRoundtripDir)
      .orderBy("doc_id")
  }

  val q104Sql: String =
    s"""SELECT doc_id, lang2, source, n_chars
      |FROM read_csv('$csvRoundtripDir/*.csv', header=false, nullstr='',
      |  columns={'doc_id':'BIGINT','lang2':'VARCHAR',
      |           'source':'VARCHAR','n_chars':'BIGINT'})
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q104_csv_roundtrip" -> q104_csv_roundtrip)

  val oracleSql: Map[String, String] = Map(
    "q104_csv_roundtrip" -> q104Sql)
}
