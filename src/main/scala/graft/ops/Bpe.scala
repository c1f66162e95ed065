package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge learning (Sennrich et al., "Neural Machine Translation of
  * Rare Words with Subword Units" — public literature): iteratively merge
  * the most frequent adjacent symbol pair over a word-frequency dict,
  * emitting the learned merge table — the trained artifact a tokenizer
  * loads.
  *
  * Scale design: BPE trains on the WORD-FREQUENCY DICT, not the corpus —
  * one corpus-scale aggregate builds (word, count), and every merge round
  * is a dict-scale pair-count aggregate (partial/final, map-side combine)
  * plus a single-row argmax collect. The driver paces rounds exactly like
  * the CC fixpoint (one bounded job per round, one scalar row on the
  * driver per round, never row data). [[Materialize]] cuts the growing
  * lineage each round.
  *
  * Determinism: the winning pair is (count DESC, pair lexicographic ASC)
  * — integer counts and binary string comparison, so any engine replays
  * the same merge sequence bit-for-bit. The merge is applied by LITERAL
  * string replace over a separator-wrapped symbol string: every symbol is
  * wrapped as ␟sym␟ (U+001F, below every printable codepoint, so
  * pair-string ordering equals (left, right) tuple ordering), and
  * replacing ␟a␟␟b␟ → ␟ab␟ is left-to-right non-overlapping in both
  * Spark and DuckDB — the exact textbook BPE application order.
  */
object Bpe {

  val Sep = "\u001f"

  /** The word-frequency dict BPE trains on — (word, n) over whitespace
    * tokens of `textCol`, empty tokens excluded. ONE definition shared by
    * the in-query learns (q105/q108) and the stored-state delta generator
    * ([[graft.pipeline.CorpusBuild]] `trackMerges`): per-batch dicts are
    * ADDITIVE (corpus dict = sum of batch dicts), which is exactly what
    * makes the trained artifact maintainable incrementally even though
    * the merge learning itself is global.
    */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Learn `numMerges` merges over a (wordCol, countCol) frequency dict.
    *
    * @return (merge_rank, lhs, rhs, n) — rank-ordered merge table; n is
    *         the pair's weighted frequency when it won. Fewer rows than
    *         numMerges when the dict runs out of adjacent pairs.
    */
  def learnMerges(dict: DataFrame, wordCol: String, countCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = dict.sparkSession
    // ␟c1␟␟c2␟…: each initial symbol is one character, sep-wrapped
    var state = Materialize(dict.select(
      col(countCol).cast("long").as("cnt"),
      concat(lit(Sep),
        array_join(filter(split(col(wordCol), ""), c => c =!= ""),
          Sep + Sep),
        lit(Sep)).as("s")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    // lineage-cut cadence (see the replace below); 8 keeps the 8-merge
    // test-scale learns checkpoint-free while bounding any run's chained
    // plan depth
    val ckptEvery = 8
    var sinceCkpt = 0
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val syms = split(expr("substring(s, 2, length(s) - 2)"), Sep + Sep)
      val best = state
        .filter(size(syms) >= 2) // sequence(1, 0) would run DESCENDING
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(syms) - 1),
          i => concat(element_at(syms, i), lit(Sep),
            element_at(syms, i + 1)))).as("p"))
        .groupBy("p").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("p")) // TakeOrdered: no global sort
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val p = best(0).getString(0)
        val n = best(0).getLong(1)
        val Array(a, b) = p.split(Sep, 2)
        merges += Row(r.toLong, a, b, n)
        // literal replace — call_function keeps symbols out of SQL-string
        // escaping entirely. The replace CHAINS lazily on the last
        // checkpoint: a per-row string replace over the dict is far
        // cheaper than the per-round materialization job the loop used
        // to pay (round-16 measurement: the checkpoint job, not the
        // count aggregate, dominated each round at test scale), so
        // lineage is cut every ckptEvery rounds instead — a re-executed
        // round between checkpoints re-applies at most ckptEvery cheap
        // replaces, and a 32k-merge production run still truncates its
        // plan regularly.
        state = state.select(col("cnt"),
          call_function("replace", col("s"),
            lit(Sep + a + Sep + Sep + b + Sep),
            lit(Sep + a + b + Sep)).as("s"))
        sinceCkpt += 1
        if (sinceCkpt >= ckptEvery) {
          state = Materialize(state)
          sinceCkpt = 0
        }
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("merge_rank", LongType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("n", LongType, nullable = false))))
  }

  /** Segment every dict word with a learned merge table: replay the
    * merges in rank order (the BPE inference rule) and return
    * (word, n_symbols) — the readout for coverage/compression curves.
    * `merges` is collected to the driver (merge tables are tokenizer
    * artifacts: 32k–256k rows, broadcast-sized by construction).
    */
  def segment(dict: DataFrame, wordCol: String,
      merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("merge_rank")
      .select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val init = concat(lit(Sep),
      array_join(filter(split(col(wordCol), ""), c => c =!= ""), Sep + Sep),
      lit(Sep))
    val folded = ms.foldLeft(init) { case (acc, (a, b)) =>
      call_function("replace", acc,
        lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
    }
    // k symbols carry exactly 2k separator chars → count seps, halve
    val nSyms = ((length(folded) -
      length(call_function("replace", folded, lit(Sep), lit("")))) / 2)
      .cast("long")
    dict.select(col(wordCol).as("word"), nSyms.as("n_symbols"))
  }

  /** q108's compression readout for a COLLECTED merge list — per doc of
    * a (doc_id, text) relation: whitespace-token vs BPE-symbol counts
    * and their integer-ppm expansion. The doc is represented as its
    * ␟-wrapped words joined by spaces, so the SAME literal replace chain
    * that trained the merges applies them — merges cannot cross word
    * boundaries (a pattern needs ␟␟ between symbols; the boundary is
    * "␟ ␟") and symbol counting is separator-count/2. A PER-ROW
    * projection: one corpus scan, nothing shuffles, no token-dict join.
    * ONE definition shared by the in-query learn+apply (q108) and the
    * stored-tokenizer serve path
    * ([[graft.pipeline.CorpusBuild.stateBpeTokenize]]).
    */
  def tokenizeDocs(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val S = Sep
    val words = filter(split(trim(col("text")), "\\s+"), w => w =!= "")
    val docRepr = array_join(
      transform(words, w => concat(lit(S),
        array_join(filter(split(w, ""), c => c =!= ""), S + S), lit(S))),
      " ")
    val folded = merges.foldLeft(docRepr) { case (acc, (a, b)) =>
      call_function("replace", acc,
        lit(S + a + S + S + b + S), lit(S + a + b + S))
    }
    val nSyms = ((length(folded) -
      length(call_function("replace", folded, lit(S), lit("")))) / 2)
      .cast("long")
    docs.select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"),
        nSyms.as("n_bpe_symbols"))
      .select(col("doc_id"), col("n_tokens"), col("n_bpe_symbols"),
        expr("(1000000 * n_bpe_symbols) DIV greatest(n_tokens, 1L)")
          .as("expansion_ppm"))
  }
}
