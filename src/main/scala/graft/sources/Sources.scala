package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources and sinks (SURVEY §2.1).
  *
  * The reference moves data through CSV staging files, a Postgres pair of
  * schemas, and a date-partitioned HTML file lake
  * (/root/reference/airflow/dags/scrape_url.py:94,101-116,
  * /root/reference/spark/ParseHtml.py:33-41,74-80). Engine-native storage is
  * columnar Parquet with hive-style partitioning; CSV remains for ingest and
  * export parity; the HTML lake is read with the binaryFile source so content
  * and path arrive together and partition pruning applies to yyyy/MM/dd.
  */
object Sources {

  /** Schema-enforced CSV read (S4: the COPY FROM load). No inference at
    * scale — a declared schema keeps the read single-pass.
    */
  def readCsv(spark: SparkSession, schema: StructType, path: String,
      header: Boolean = false): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** S3/S5: CSV sink. The reference writes unquoted, comma-separated lines
    * with empty strings for NULL (export_to_csv.py:12-26); emptyValue and
    * nullValue reproduce the observable file contents with a real CSV
    * writer underneath.
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = false): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)

  /** S6: the HTML lake read. One row per file: (path, modificationTime,
    * length, content). Partition columns in the path (yyyy/MM/dd) prune at
    * the file index, so a day's reparse touches a day's files.
    */
  def readHtmlLake(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.html")
      .load(glob)
      .select(
        col("path"),
        col("modificationTime"),
        col("content").cast("string").as("html"))

  /** S7: partitioned lake write for derived text/binary artifacts. */
  def writePartitioned(df: DataFrame, path: String, partitions: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitions: _*)
      .parquet(path)

  /** S2-equivalent idempotent append: only rows whose key is absent from the
    * current sink contents are appended (SURVEY §4.3 ledger contract).
    */
  def appendNewKeys(spark: SparkSession, df: DataFrame, path: String, keys: Seq[String]): Unit = {
    // Existence must be resolved through the path's own filesystem —
    // java.io.File is always false for hdfs:// / s3a:// URIs, which would
    // silently skip the anti-join and append duplicate keys on re-run.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val incoming =
      if (fs.exists(hPath)) {
        val existing = spark.read.parquet(path).select(keys.map(col): _*)
        df.join(existing, keys, "left_anti")
      } else df
    incoming.write.mode(SaveMode.Append).parquet(path)
  }
}
