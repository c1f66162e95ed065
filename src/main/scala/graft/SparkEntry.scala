package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, ClassifierQueries, CompletenessQueries, CoreQueries, CurationQueries, ExpansionQueries, ExtensionQueries, FilterQueries, MixQueries, PiiQueries, PrepQueries, ReleaseQueries, StorageQueries, TokenizerQueries, UrlQueries, WebQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join revenue aggregate exercises scans, broadcast + shuffle
    * joins, and exact aggregation in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q13_star_join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtensionQueries.queries ++
      AnalyticsQueries.queries ++ CompletenessQueries.queries ++
      ExpansionQueries.queries ++ PrepQueries.queries ++
      CurationQueries.queries ++ MixQueries.queries ++
      StorageQueries.queries ++ TokenizerQueries.queries ++
      FilterQueries.queries ++ PiiQueries.queries ++
      ClassifierQueries.queries ++ UrlQueries.queries ++ ReleaseQueries.queries ++
      WebQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ExtensionQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ CompletenessQueries.oracleSql ++
      ExpansionQueries.oracleSql ++ PrepQueries.oracleSql ++
      CurationQueries.oracleSql ++ MixQueries.oracleSql ++
      StorageQueries.oracleSql ++ TokenizerQueries.oracleSql ++
      FilterQueries.oracleSql ++ PiiQueries.oracleSql ++
      ClassifierQueries.oracleSql ++ UrlQueries.oracleSql ++ ReleaseQueries.oracleSql ++
      WebQueries.oracleSql
}
