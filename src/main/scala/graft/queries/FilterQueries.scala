package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Round-7 within-document repetition filters — the Rae et al. (Gopher)
  * quality-filter family a training-data pipeline runs over every crawled
  * document: duplicate-word fraction, top-word fraction, duplicate-bigram
  * fraction, self-repetition cleanup, and a corpus-LM surprisal score.
  *
  * Scale shape: q134/q135/q137 are PURE per-row transforms — tokenize,
  * sort, and scan each document's own tokens with HOFs (no explode, no
  * join, no per-document shuffle), so at 100 TB they are map-only over
  * the scan and the only exchange is the final orderBy for the readout
  * (a real pipeline writes the flags without sorting at all). q136 joins
  * the exploded tokens against a broadcast vocabulary (unigram counts are
  * vocab-sized, orders of magnitude below doc count), so its only
  * required shuffle is the vocab-count aggregate plus the per-document
  * rollup.
  *
  * All ratios are integer parts-per-million (exact BIGINT floor division)
  * and the LM score is integer-log2 quantized (`length(bin(x)) - 1`,
  * bit-identical in Spark and DuckDB) — no float crosses the oracle
  * boundary.
  */
object FilterQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q134 — word-level repetition profile: per document, token count,
    * distinct-token count, the count of the most frequent token, and the
    * duplicate-word / top-word fractions in ppm. All three counts come
    * from ONE sorted-run scan of the document's own token array
    * ([[TextAnalysis.runStats]]) — no explode, no shuffle, and the token
    * array is evaluated once per row.
    */
  val q134_word_repetition: Q = (s, d) => {
    val toks = filter(TextAnalysis.tokens(col("text")), t => length(t) > 0)
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.runStats(toks).as("st"))
      .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
        col("st.n_distinct").as("n_distinct"), col("st.top_cnt").as("top_cnt"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("top_cnt"),
        TextAnalysis.intDiv(
          (col("n_tokens") - col("n_distinct")) * 1000000L,
          col("n_tokens")).as("dup_ppm"),
        TextAnalysis.intDiv(col("top_cnt") * 1000000L, col("n_tokens"))
          .as("top_ppm"))
      .orderBy("doc_id")
  }

  val q134Sql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |wc AS (
      |  SELECT doc_id, w, count(*) AS c FROM w
      |  WHERE len(w) > 0 GROUP BY doc_id, w),
      |agg AS (
      |  SELECT doc_id,
      |    CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_distinct,
      |    CAST(max(c) AS BIGINT) AS top_cnt
      |  FROM wc GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_distinct, top_cnt,
      |  (n_tokens - n_distinct) * 1000000 // n_tokens AS dup_ppm,
      |  top_cnt * 1000000 // n_tokens AS top_ppm
      |FROM agg ORDER BY doc_id""".stripMargin

  /** q135 — duplicate-bigram profile: the adjacent-bigram analogue of
    * q134 (Gopher's dup-2-gram filter). Bigrams keep multiplicity —
    * repetition IS the signal — and the top count is the same per-row
    * sorted-run scan over packed 64-bit bigram KEYS
    * ([[TextAnalysis.wordBigramKeys]]; sorting longs, not concatenated
    * strings, cut 5.9 s → see RepetitionSpec's key≡string canary), so
    * this too is map-only. Documents with fewer than two tokens have no
    * bigrams and drop out (both engines).
    */
  val q135_dup_bigram: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.runStats(
          TextAnalysis.wordBigramKeys(TextAnalysis.tokens(col("text"))))
          .as("st"))
      .select(col("doc_id"), col("st.n_tokens").as("n_bigrams"),
        col("st.top_cnt").as("top_cnt"))
      .filter(col("n_bigrams") > 0)
      .select(col("doc_id"), col("n_bigrams"), col("top_cnt"),
        TextAnalysis.intDiv(col("top_cnt") * 1000000L, col("n_bigrams"))
          .as("top_ppm"))
      .orderBy("doc_id")
  }

  val q135Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, unnest([ws[i] || chr(31) || ws[i+1]
      |                         for i in generate_series(1, len(ws)-1)]) AS bg
      |  FROM t WHERE len(ws) >= 2),
      |bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg),
      |agg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |    CAST(max(c) AS BIGINT) AS top_cnt
      |  FROM bc GROUP BY doc_id)
      |SELECT doc_id, n_bigrams, top_cnt,
      |  top_cnt * 1000000 // n_bigrams AS top_ppm
      |FROM agg ORDER BY doc_id""".stripMargin

  /** q136 — corpus-LM surprisal score (the CCNet-style "how unusual is
    * this document under a corpus language model" quality signal, with a
    * unigram LM and integer-log2 quantization): per token,
    * floorLog2(total) - floorLog2(count(w)); per document, the sum and
    * the 1e6-scaled mean. The unigram table is vocab-sized, so the
    * per-token lookup is a broadcast join; the 1-row total joins in as a
    * declared scalar broadcast (PlanSpec allowlist).
    */
  val q136_surprisal: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val counts = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("t"))
    val lq = counts.crossJoin(broadcast(total))
      .select(col("w"),
        (TextAnalysis.floorLog2(col("t")) - TextAnalysis.floorLog2(col("c")))
          .as("q"))
    tok.join(broadcast(lq), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("q")).as("surprisal_sum"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_sum"),
        TextAnalysis.intDiv(col("surprisal_sum") * 1000000L, col("n_tokens"))
          .as("avg_q6"))
      .orderBy("doc_id")
  }

  val q136Sql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |w2 AS (SELECT doc_id, w FROM w WHERE len(w) > 0),
      |c AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w2 GROUP BY w),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
      |lq AS (
      |  SELECT w, CAST((length(bin(t)) - 1) - (length(bin(c)) - 1) AS BIGINT)
      |    AS q
      |  FROM c, t)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(q) AS BIGINT) AS surprisal_sum,
      |  CAST(sum(q) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT) AS avg_q6
      |FROM w2 JOIN lq USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q137 — self-repetition cleanup: collapse runs of consecutive
    * duplicate tokens ("batch batch batch" → "batch") and report how many
    * tokens were removed — a cleaning TRANSFORM (it rewrites text), not
    * just a flag, and still a pure per-row HOF pass.
    */
  val q137_collapse_runs: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n0"),
        TextAnalysis.collapseRuns(col("w")).as("c"))
      .select(col("doc_id"),
        (col("n0") - size(col("c")).cast("long")).as("n_removed"),
        array_join(col("c"), " ").as("cleaned"))
      .orderBy("doc_id")
  }

  val q137Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, len(ws) AS n0,
      |    [ws[i] for i in generate_series(1, len(ws))
      |     if i = 1 or ws[i] != ws[i-1]] AS cw
      |  FROM t)
      |SELECT doc_id, CAST(n0 - len(cw) AS BIGINT) AS n_removed,
      |  array_to_string(cw, ' ') AS cleaned
      |FROM c ORDER BY doc_id""".stripMargin

  /** q146 — per-doc token self-entropy in the q136 integer-log2
    * quantization: Σ_distinct f·(⌊log2 n⌋ − ⌊log2 f⌋), 1e6-scaled mean —
    * the within-doc diversity signal (low = repetitive/templated text,
    * the complement of q134's top-word fraction; q136 scores against the
    * CORPUS distribution, this against the doc's own). Map-only like the
    * Gopher family: one sorted-run HOF pass per row
    * ([[TextAnalysis.runEntropySum]]), no explode, no per-doc shuffle —
    * the only exchange is the final sort.
    */
  val q146_doc_entropy: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("ws",
        filter(TextAnalysis.tokens(col("text")), t => length(t) > 0))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        TextAnalysis.runEntropySum(col("ws")).as("entropy_sum"))
      .filter(col("n_tokens") >= 1L)
      .select(col("doc_id"), col("n_tokens"), col("entropy_sum"),
        expr("(1000000 * entropy_sum) DIV n_tokens").as("avg_q6"))
      .orderBy("doc_id")

  val q146Sql: String =
    """WITH e AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |e2 AS (SELECT doc_id, w FROM e WHERE len(w) > 0),
      |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
      |      FROM e2 GROUP BY doc_id),
      |f AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS f
      |      FROM e2 GROUP BY doc_id, w),
      |s AS (
      |  SELECT f.doc_id, any_value(n.n_tokens) AS n_tokens,
      |    CAST(SUM(f.f * ((length(bin(n.n_tokens)) - 1)
      |      - (length(bin(f.f)) - 1))) AS BIGINT) AS entropy_sum
      |  FROM f JOIN n ON f.doc_id = n.doc_id
      |  GROUP BY f.doc_id)
      |SELECT doc_id, n_tokens, entropy_sum,
      |  CAST((1000000 * entropy_sum) // n_tokens AS BIGINT) AS avg_q6
      |FROM s ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q134_word_repetition" -> q134_word_repetition,
    "q135_dup_bigram" -> q135_dup_bigram,
    "q136_surprisal" -> q136_surprisal,
    "q137_collapse_runs" -> q137_collapse_runs,
    "q146_doc_entropy" -> q146_doc_entropy)

  val oracleSql: Map[String, String] = Map(
    "q134_word_repetition" -> q134Sql,
    "q135_dup_bigram" -> q135Sql,
    "q136_surprisal" -> q136Sql,
    "q137_collapse_runs" -> q137Sql,
    "q146_doc_entropy" -> q146Sql)
}
