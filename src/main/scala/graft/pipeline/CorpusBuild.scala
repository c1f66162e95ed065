package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.ops.{Components, TextDedup}

/** The end-to-end corpus build — the LLM-side counterpart of JobsPipeline:
  * what a training-data team actually runs, composed entirely from the
  * library's oracle-checked operators, as one declarative dataflow:
  *
  *  1. quality  — min-length / min-token / integer-ppm score filters (q90's
  *                stage flags)
  *  2. exact    — one survivor per normalized content fingerprint (q17/q24)
  *  3. near-dup — MinHash-LSH candidate pairs (q19) → connected components
  *                (q56) → longest-doc survivor per cluster (q74)
  *  4. split    — deterministic md5-bucket train/val/test assignment (q84)
  *  5. write    — parquet partitioned by split + a per-split manifest
  *                (doc/token counts — q82's rollup shape)
  *
  * Every stage is a pure DataFrame → DataFrame function; nothing is
  * collected, every shuffle is keyed (digests, shingle buckets, component
  * labels, split values), so the same plan runs at any scale. Re-running
  * over the same input is bit-identical (deterministic survivors, hash
  * splits) — the property that makes corpus versions diffable (q85).
  */
object CorpusBuild {

  final case class Config(
      minChars: Long = 100L,
      minTokens: Long = 20L,
      minQualityPpm: Long = 400000L,
      shingleN: Int = 3,
      numHashes: Int = 48,
      bands: Int = 8,
      jaccardThreshold: Double = 0.5)

  /** Stage 1-2-3: the keep-list (doc ids that survive quality + exact +
    * near-dup dedup), annotated with the reason each dropped doc died —
    * the explainability surface reviewers ask for ("why is this doc out?").
    */
  def survivors(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val flagged = docs.select(
      col("doc_id"), col("text"),
      (col("n_chars") >= cfg.minChars).as("len_ok"),
      (TextAnalysis.tokenCount(col("text")).cast("long") >= cfg.minTokens)
        .as("tok_ok"),
      (TextAnalysis.qualityScorePpm(col("text")) >= cfg.minQualityPpm)
        .as("q_ok"),
      TextAnalysis.fingerprintMd5(col("text")).as("fp"))
    val qualityPass = flagged
      .filter(col("len_ok") && col("tok_ok") && col("q_ok"))
    // exact tier: min doc_id per fingerprint among quality survivors
    val exactKeep = qualityPass
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactPass = qualityPass.join(exactKeep, Seq("doc_id"), "left_semi")
    // near-dup tier: LSH pairs → components → keep the longest doc (ties:
    // smallest id) per cluster. Pairs/components see only exact survivors.
    val pairs = TextDedup.minhashLshPairs(exactPass, "doc_id", "text",
        n = cfg.shingleN, numHashes = cfg.numHashes, bands = cfg.bands,
        threshold = cfg.jaccardThreshold)
      .select("id_a", "id_b")
    val comp = Components.connectedComponents(
      exactPass.select(col("doc_id").as("id")), pairs)
    val byLen = Window.partitionBy("component")
      .orderBy(length(col("text")).desc, col("id"))
    comp
      .join(exactPass.select(col("doc_id").as("id"), col("text")), "id")
      .withColumn("rk", row_number().over(byLen))
      .filter(col("rk") === 1)
      .select(col("id").as("doc_id"))
  }

  /** Stage 4-5: materialize the deduped corpus with split assignment,
    * write parquet partitioned by split, and return the per-split
    * manifest. `outDir == None` skips the write (dry-run / test).
    */
  def run(docs: DataFrame, outDir: Option[String],
      cfg: Config = Config()): DataFrame = {
    val keep = survivors(docs, cfg)
    val corpus = docs.join(keep, Seq("doc_id"), "left_semi")
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .drop("bucket")
    outDir.foreach { dir =>
      corpus.write.mode(SaveMode.Overwrite)
        .partitionBy("split").parquet(dir)
    }
    corpus
      .select(col("split"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"),
        col("n_chars"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy("split")
  }
}
