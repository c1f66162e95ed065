package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent table lifecycle (SURVEY §2.1 S10).
  *
  * The reference manages tables with `CREATE TABLE IF NOT EXISTS`, CTAS, and
  * `DROP TABLE IF EXISTS`
  * (/root/reference/airflow/dags/sql/parse_html_in_spark_create_parsed_job_table.sql:1,
  * impute_salary_create_salary_table.sql:1-3, scrape_url_drop_temp_table.sql:1).
  * Spark's catalog provides the same lifecycle; derived tables follow the
  * reference's drop-and-rebuild CTAS contract (full overwrite), which is
  * what makes re-runs idempotent without transactions.
  */
object Catalog {

  def createTableIfNotExists(spark: SparkSession, name: String, ddlSchema: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name ($ddlSchema) USING parquet")

  /** CTAS with drop-first semantics — the reference's rebuild idiom for
    * derived tables (schema derived from the query).
    */
  def rebuildAs(spark: SparkSession, name: String, df: DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.saveAsTable(name)
  }

  def dropIfExists(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $name")

  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)
}
