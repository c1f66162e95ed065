package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** CLI entry for the full jobs dataflow (the reference's four DAGs end to
  * end): read sighting CSVs + an HTML lake, dedupe, parse, impute, quality-
  * gate, and export parsed_jobs as CSV + parquet.
  *
  * Usage: runMain graft.pipeline.PipelineMain <sightingsCsvDir> <lakeGlob> <outDir>
  *
  * The lake path layout is yyyy/MM/dd/<job_id>.html; job_id is recovered
  * from the file name (reference: scrape_url.py:101-116).
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val Array(csvDir, lakeGlob, outDir) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-jobs-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sightings = Sources.readCsv(spark, graft.schema.Schemas.rawScrapedUrl, csvDir)
    val pages = Sources.readHtmlLake(spark, lakeGlob)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.html$", 1).as("job_id"),
        col("html"),
        col("path").as("file_path"),
        to_date(regexp_extract(col("path"), "(\\d{4}/\\d{2}/\\d{2})", 1), "yyyy/MM/dd")
          .as("scraped_date"))

    val raw = JobsPipeline.ingest(Seq(sightings))
    // the ledger view of the lake: one row per fetched job
    val report = JobsPipeline.qualityGate(
      pages.select("job_id", "file_path", "scraped_date"))
    val parsed = JobsPipeline.parse(pages)
    val imputed = JobsPipeline.imputeSalaries(raw)
    val result = JobsPipeline.backfill(parsed, imputed)

    result.write.mode(SaveMode.Overwrite).parquet(s"$outDir/parsed_jobs")
    Sources.writeCsv(result, s"$outDir/parsed_jobs_csv", header = true)
    println(s"[pipeline] rows=${result.count()} " +
      s"quality(nRows=${report.nRows}, dupKeys=${report.dupKeys}, nNulls=${report.nNulls})")
    spark.stop()
  }
}
