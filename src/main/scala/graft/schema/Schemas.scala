package graft.schema

import org.apache.spark.sql.types._

/** Typed schemas for the jobs pipeline tables.
  *
  * Derived from the reference DDLs (see /root/reference):
  *   - airflow/dags/sql/scrape_url_create_raw_table.sql:1-12
  *   - airflow/dags/sql/scrape_url_dedupe_jobs.sql:3-8
  *   - airflow/dags/sql/scrape_url_create_scraped_job_table.sql:1-8
  *   - airflow/dags/sql/impute_salary_create_salary_table.sql:3-9
  *   - airflow/dags/sql/parse_html_in_spark_create_parsed_job_table.sql:1-19
  *
  * Postgres `varchar(n)`/`text` map to StringType (length enforced only as a
  * data-quality rule), `integer` to IntegerType, `date` to DateType, and the
  * `SERIAL` surrogate id to LongType populated via monotonically_increasing_id.
  */
object Schemas {

  /** One row per (search-combo, job) sighting. */
  case class RawScrapedUrl(
      keyword: String,
      job_id: String,
      salary_min: Option[Int],
      salary_max: Option[Int],
      scrape_date: java.sql.Date,
      url: String)

  val rawScrapedUrl: StructType = StructType(Seq(
    StructField("keyword", StringType),
    StructField("job_id", StringType),
    StructField("salary_min", IntegerType),
    StructField("salary_max", IntegerType),
    StructField("scrape_date", DateType),
    StructField("url", StringType)))

  /** Deduped (one arbitrary sighting per job). */
  case class UniqueJob(keyword: String, job_id: String, url: String)

  val uniqueJob: StructType = StructType(Seq(
    StructField("keyword", StringType),
    StructField("job_id", StringType),
    StructField("url", StringType)))

  /** Ledger of fetched pages (job_id is the PK). */
  case class ScrapedJob(
      job_id: String,
      url: String,
      scraped_date: Option[java.sql.Date],
      file_path: Option[String])

  val scrapedJob: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("url", StringType),
    StructField("scraped_date", DateType),
    StructField("file_path", StringType)))

  /** Output of the min/max band aggregation (impute_salary DAG). */
  case class ImputedSalary(job_id: String, min_salary: Option[Int], max_salary: Option[Int])

  val imputedSalary: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("min_salary", IntegerType),
    StructField("max_salary", IntegerType)))

  /** The 12 string fields the HTML parser extracts, pre-cast.
    * Kept as strings ("" for missing) to mirror the parse layer's contract;
    * typed casts ("" -> null) happen in the projection that builds ParsedJob.
    */
  case class ParsedJobFields(
      job_title: String,
      company_name: String,
      job_description: String,
      location: String,
      official_post_date: String,
      min_official_salary: String,
      max_official_salary: String,
      career_level: String,
      qualification: String,
      job_type: String,
      job_functions: String,
      industry: String)

  /** staging.parsed_jobs after casts + imputation columns. */
  case class ParsedJob(
      job_id: String,
      job_title: String,
      company_name: String,
      job_description: String,
      location: String,
      official_post_date: Option[java.sql.Date],
      min_official_salary: Option[Int],
      max_official_salary: Option[Int],
      career_level: String,
      qualification: String,
      job_type: String,
      job_functions: String,
      industry: String,
      min_salary: Option[Int],
      max_salary: Option[Int])

  val parsedJob: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("job_title", StringType),
    StructField("company_name", StringType),
    StructField("job_description", StringType),
    StructField("location", StringType),
    StructField("official_post_date", DateType),
    StructField("min_official_salary", IntegerType),
    StructField("max_official_salary", IntegerType),
    StructField("career_level", StringType),
    StructField("qualification", StringType),
    StructField("job_type", StringType),
    StructField("job_functions", StringType),
    StructField("industry", StringType),
    StructField("min_salary", IntegerType),
    StructField("max_salary", IntegerType)))
}
