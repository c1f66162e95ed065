package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.ops.{Mixing, Packing}

/** Round-5 data-mixing surface (q99–q100): the two steps between a curated
  * corpus and a training run — choosing HOW MUCH of each source to take
  * (deterministic temperature-scaled mixing) and WHAT ORDER to feed it in
  * (deterministic global shuffle, packed into fixed-length sequences).
  * Both are pure functions of (doc_id, per-source aggregates), so the mix
  * and the order are reproducible on any engine and stable under re-runs —
  * the property that makes a 100 TB training corpus auditable.
  */
object MixQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q99 — temperature-scaled source mixing (τ = 0.5): sampling weight
    * ∝ √n_s upweights small sources, per-source acceptance rate
    * min(1, target·√n_s/Σ√n/n_s), and each doc's md5-uniform decides
    * acceptance — the standard multilingual/multi-source LM mix recipe,
    * made deterministic and partition-invariant (ops.Mixing). One count
    * aggregate + one broadcast join + a codegen'd filter: the corpus is
    * scanned once and never shuffled. √ (not pow) because IEEE sqrt is
    * correctly rounded — both engines compute bit-identical rates, and
    * the one cross-row float sum (Σ√n) runs as an exact DECIMAL sum.
    */
  val q99_temperature_mix: Q = (s, d) => {
    Mixing.sqrtTemperatureSample(
        Tables.documents(s, d).select("doc_id", "source"),
        "doc_id", "source", targetDocs = 300L)
      .select(col("doc_id"), col("source"),
        col("n_docs").cast("long").as("n_source_docs"), col("rate"))
      .orderBy("doc_id")
  }

  val q99Sql: String =
    """WITH c AS (
      |  SELECT source, CAST(count(*) AS DOUBLE) AS n_docs
      |  FROM documents GROUP BY source),
      |t AS (
      |  SELECT CAST(SUM(CAST(sqrt(n_docs) AS DECIMAL(28,10))) AS DOUBLE)
      |    AS sum_w FROM c),
      |r AS (
      |  SELECT source, n_docs,
      |    least(1.0, 300.0 * sqrt(n_docs) / sum_w / n_docs) AS rate
      |  FROM c, t)
      |SELECT d.doc_id, d.source, CAST(r.n_docs AS BIGINT) AS n_source_docs,
      |  r.rate
      |FROM documents d JOIN r USING (source)
      |WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
      |    AS UBIGINT) AS DOUBLE) / 4294967296.0 < r.rate
      |ORDER BY d.doc_id""".stripMargin

  /** q100 — deterministic global shuffle + pack: the training-order step.
    * Every doc gets a unique 60-bit shuffle key (40 md5 bits, then its
    * own id in the low 20 bits — collision-free by construction while
    * ids stay under 2^20; a larger id space widens the split, e.g.
    * 28+32 bits, or keys as DECIMAL — the construction is unchanged),
    * the corpus is packed into 2048-token sequences in KEY order, and
    * the placement is ops.Packing's hierarchical pack over the key space
    * (range shards of the hash domain; a constant mix column — packing
    * is global here) — so the "globally shuffled epoch" never runs a
    * global window: the per-shard prefix sums parallelize and the rebase
    * window sees only shard-count rows.
    */
  val q100_shuffle_pack: Q = (s, d) => {
    val counts = Tables.documents(s, d)
      .select(col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 10), 16, 10)
          .cast("long") * lit(1048576L) + col("doc_id")).as("skey"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"),
        lit("all").as("mix"))
    Packing.packSequences(counts, "skey", "mix", "n_toks",
        seqLen = 2048L, shardRows = 1L << 52)
      .select("doc_id", "skey", "n_toks", "seq_id", "seq_offset")
      .orderBy("doc_id")
  }

  val q100Sql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))
      |      AS UBIGINT) AS BIGINT) * 1048576 + doc_id AS skey,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, skey, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (ORDER BY skey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_before
      |  FROM c)
      |SELECT doc_id, skey, n_toks,
      |  cum_before // 2048 AS seq_id,
      |  cum_before % 2048 AS seq_offset
      |FROM s ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q99_temperature_mix" -> q99_temperature_mix,
    "q100_shuffle_pack" -> q100_shuffle_pack)

  val oracleSql: Map[String, String] = Map(
    "q99_temperature_mix" -> q99Sql,
    "q100_shuffle_pack" -> q100Sql)
}
