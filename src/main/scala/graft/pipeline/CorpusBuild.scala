package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.ops.{Components, Dedupe, Mixing, Packing, Splits, TextDedup}

/** The end-to-end corpus build — the LLM-side counterpart of JobsPipeline:
  * what a training-data team actually runs, composed entirely from the
  * library's oracle-checked operators, as one declarative dataflow:
  *
  *  1. quality  — min-length / min-token / integer-ppm score filters (q90's
  *                stage flags)
  *  2. exact    — one survivor per normalized content fingerprint
  *                ([[TextDedup.exactDedup]]; q17/q24)
  *  3. near-dup — MinHash-LSH candidate pairs (q19) → alternating-star
  *                connected components (diameter-robust, O(log n) rounds —
  *                a chain of incrementally-edited near-dup docs must not
  *                abort the build) → longest-doc survivor per cluster
  *                ([[Dedupe.firstRowPerKey]]; q56/q74)
  *  4. split    — deterministic md5-bucket train/val/test assignment
  *                ([[Splits]] — the same arithmetic q84 oracle-checks)
  *  5. write    — parquet partitioned by split + a per-split manifest
  *                (doc/token counts — q82's rollup shape)
  *  6. feed     — (optional, [[trainFeed]]) temperature-mix the train
  *                split's sources and place every mixed doc into its
  *                2048-token training sequence in deterministic shuffled
  *                order ([[Mixing]]/[[Packing]] — q99/q100's operators)
  *
  * Every stage is a pure DataFrame transform and every shuffle is keyed
  * (digests, shingle buckets, component labels, split values), so the same
  * plan runs at any scale; the only driver-side loop is the CC fixpoint
  * (one bounded job per round, no row data on the driver). When a write
  * target is given, the manifest aggregates the parquet just written
  * instead of re-running the dedup DAG a second time.
  */
object CorpusBuild {

  final case class Config(
      minChars: Long = 100L,
      minTokens: Long = 20L,
      minQualityPpm: Long = 400000L,
      shingleN: Int = 3,
      numHashes: Int = 48,
      bands: Int = 8,
      jaccardThreshold: Double = 0.5,
      ccMaxIter: Int = 35)

  /** Stage 1-2-3: the keep-list — doc ids surviving quality + exact +
    * near-dup dedup. Executes the CC fixpoint eagerly (driver-paced
    * rounds); callers wanting per-doc drop reasons join the result back to
    * [[qualityFlags]].
    */
  def survivors(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val qualityPass = qualityFlags(docs, cfg)
      .filter(col("len_ok") && col("tok_ok") && col("q_ok"))
      .select("doc_id", "text")
    val exactPass = qualityPass.join(
      TextDedup.exactDedup(qualityPass, "doc_id", "text",
          hashCol = TextAnalysis.fingerprintMd5)
        .select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val pairs = TextDedup.minhashLshPairs(exactPass, "doc_id", "text",
        n = cfg.shingleN, numHashes = cfg.numHashes, bands = cfg.bands,
        threshold = cfg.jaccardThreshold)
      .select("id_a", "id_b")
    val comp = Components.connectedComponentsAlternating(
      exactPass.select(col("doc_id").as("id")), pairs, cfg.ccMaxIter)
    Dedupe.firstRowPerKey(
        comp.join(exactPass.select(col("doc_id").as("id"), col("text")), "id"),
        keys = Seq("component"),
        order = Seq(length(col("text")).desc, col("id")))
      .select(col("id").as("doc_id"))
  }

  /** Per-doc quality stage flags — the explainability surface ("why is
    * this doc out?"): join a dropped id back here to see which floors it
    * failed. The same flags drive [[survivors]]'s first filter.
    */
  def qualityFlags(docs: DataFrame, cfg: Config = Config()): DataFrame =
    docs.select(
      col("doc_id"), col("text"),
      (col("n_chars") >= cfg.minChars).as("len_ok"),
      (TextAnalysis.tokenCount(col("text")).cast("long") >= cfg.minTokens)
        .as("tok_ok"),
      (TextAnalysis.qualityScorePpm(col("text")) >= cfg.minQualityPpm)
        .as("q_ok"))

  /** Stage 4-5: materialize the deduped corpus with split assignment,
    * write parquet partitioned by split (when `outDir` is set), and return
    * the per-split manifest. With a write target the manifest reads the
    * files just written — one execution of the dedup DAG, and the manifest
    * describes what is actually on disk.
    */
  def run(docs: DataFrame, outDir: Option[String],
      cfg: Config = Config()): DataFrame = {
    val keep = survivors(docs, cfg)
    val corpus = docs.join(keep, Seq("doc_id"), "left_semi")
      .withColumn("split", Splits.split(col("doc_id")))
    val manifestSource = outDir match {
      case Some(dir) =>
        corpus.write.mode(SaveMode.Overwrite)
          .partitionBy("split").parquet(dir)
        // explicit schema: an all-filtered (empty) corpus writes only
        // _SUCCESS, and schema INFERENCE over a part-less dir throws —
        // the build must return an empty manifest, not die after a
        // successful write
        docs.sparkSession.read.schema(corpus.schema).parquet(dir)
      case None => corpus
    }
    manifestSource
      .select(col("split"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"),
        col("n_chars"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy("split")
  }

  /** Stage 6: the train-feed — from a split-assigned corpus (the shape
    * [[run]] writes) to the actual training order: temperature-mix the
    * train split's sources (√-weights upweight small sources;
    * [[Mixing]]), give every accepted doc a unique shuffle key
    * ([[Packing.shuffleKey]]: md5 prefix + its own id in the low
    * `idBits`; out-of-range ids raise per-row instead of silently
    * colliding and making placement run-dependent), and
    * place it into fixed-length token
    * sequences in key order via [[Packing]]'s hierarchical pack — no
    * global window, no driver-side data. Output: one row per accepted
    * train doc with (skey, n_toks, seq_id, seq_offset); byte-identical
    * across re-runs, so epoch order is auditable.
    */
  def trainFeed(corpus: DataFrame, targetDocs: Long,
      seqLen: Long = 2048L, shardRows: Long = 1L << 52,
      idBits: Int = 20): DataFrame = {
    val train = corpus.filter(col("split") === "train")
    val mixed = Mixing.sqrtTemperatureSample(
      train, "doc_id", "source", targetDocs)
    val keyed = mixed.select(
      col("doc_id"), col("source"),
      Packing.shuffleKey(col("doc_id"), idBits).as("skey"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"),
      lit("all").as("mix"))
    Packing.packSequences(keyed, "skey", "mix", "n_toks", seqLen, shardRows)
      .select("doc_id", "source", "skey", "n_toks", "seq_id", "seq_offset")
  }
}
