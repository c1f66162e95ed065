package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The release card — the single relation a dataset release review
  * reads, composing three tiers this engine already verifies
  * separately: dedup survivor selection (q74's keep-list, served
  * through the shared cluster memo), the PII screen (q172's planted
  * algebra), and URL/domain provenance (q175's planted algebra), all
  * rolled up per source.
  *
  * 100 TB: the survivor join is the memoized cluster relation (built
  * once per session, billed to q56); everything else is map-only
  * column work plus one map-side-combined rollup shuffle with
  * |sources| output rows.
  */
object ReleaseQueries {
  type Q = (SparkSession, String) => DataFrame

  /** q179 — per-source release card: raw docs, dedup-kept docs, PII
    * exposure (docs with any hit + total typed hits), and distinct
    * planted domains. The oracle re-derives the ENTIRE composition —
    * recursive-CTE dedup clusters with the longest-wins survivor rule,
    * the PII counts, and the domain extraction — so a drift in any one
    * tier breaks the card.
    */
  val q179_release_card: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // q74's keep-list: shared cluster labeling -> longest-wins survivor
    val comp = graft.ops.TextDedup.dedupClusterRelationShared(
      docs, d, "doc_id", "text", "lang", n = 3, threshold = 0.5)
    val byLen = Window.partitionBy("component")
      .orderBy(col("n_chars").desc, col("id"))
    val kept = comp
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
      .withColumn("rk", row_number().over(byLen))
      .filter(col("rk") === 1)
      .select(col("id").as("doc_id"), lit(1L).as("is_kept"))
    val screened = PiiQueries.screened(
      docs.withColumn("aug", PiiQueries.plantedText), "aug")
    val withUrl = screened
      .withColumn("u", regexp_extract(UrlQueries.plantedText,
        UrlQueries.UrlRe, 0))
      .withColumn("domain", regexp_extract(col("u"), "https?://([^/]+)", 1))
    withUrl
      .join(kept, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(
        count(lit(1)).as("docs"),
        sum(coalesce(col("is_kept"), lit(0L))).as("kept_docs"),
        sum(when(col("n_emails") + col("n_ipv4") + col("n_phones") > 0, 1L)
          .otherwise(0L)).as("docs_with_pii"),
        sum(col("n_emails") + col("n_ipv4") + col("n_phones"))
          .as("pii_total"),
        countDistinct("domain").as("distinct_domains"))
      .orderBy("source")
  }

  val q179Sql: String = {
    val q74Inner = PrepQueries.q74Sql
    s"""WITH k AS (
       |  SELECT survivor_id FROM ( $q74Inner ) t),
       |p AS (
       |  SELECT doc_id, source,
       |    ${PiiQueries.plantedSql} AS aug,
       |    ${UrlQueries.plantedSql} AS aug_u
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    len(regexp_extract_all(aug, '${PiiQueries.EmailRe}'))
       |      + len(regexp_extract_all(aug, '${PiiQueries.Ipv4Re}'))
       |      + len(regexp_extract_all(aug, '${PiiQueries.PhoneRe}')) AS np,
       |    regexp_extract(regexp_extract(aug_u, '${UrlQueries.UrlRe}'),
       |      'https?://([^/]+)', 1) AS domain
       |  FROM p)
       |SELECT r.source,
       |  CAST(count(*) AS BIGINT) AS docs,
       |  CAST(SUM(CASE WHEN k.survivor_id IS NULL THEN 0 ELSE 1 END)
       |    AS BIGINT) AS kept_docs,
       |  CAST(SUM(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS docs_with_pii,
       |  CAST(SUM(np) AS BIGINT) AS pii_total,
       |  CAST(count(DISTINCT domain) AS BIGINT) AS distinct_domains
       |FROM r LEFT JOIN k ON k.survivor_id = r.doc_id
       |GROUP BY r.source ORDER BY r.source""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q179_release_card" -> q179_release_card)

  val oracleSql: Map[String, String] = Map(
    "q179_release_card" -> q179Sql)
}
