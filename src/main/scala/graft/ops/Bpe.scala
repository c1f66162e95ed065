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
        // escaping entirely
        state = Materialize(state.select(col("cnt"),
          call_function("replace", col("s"),
            lit(Sep + a + Sep + Sep + b + Sep),
            lit(Sep + a + b + Sep)).as("s")))
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
}
