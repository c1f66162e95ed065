package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece shape — Kudo,
  * "Subword Regularization", public literature): seed a large candidate
  * vocabulary from substring statistics, prune to a budget, re-estimate
  * piece frequencies by hard EM (Viterbi E-step over the word dict,
  * count M-step), and tokenize by Viterbi segmentation under the learned
  * table — the OTHER trained tokenizer family that matters at
  * pretraining scale next to BPE ([[Bpe]]).
  *
  * Scale design (the [[Bpe]] discipline): everything trains on the
  * WORD-FREQUENCY DICT, never the corpus — one corpus-scale aggregate
  * builds (word, n); seeding, pruning, EM, and segmentation are all
  * dict-scale, and the learned piece table is BOUNDED MODEL STATE
  * (VocabMulti + alphabet rows — the k-means-centroid collect class), so
  * segmentation is a mapPartitions over dict rows with a broadcast cost
  * map and corpus tokenization is a JOIN from exploded doc words to the
  * per-word segmentations — the corpus is never re-segmented row by row.
  *
  * Determinism (the oracle contract): probabilities never appear as
  * floats. Piece costs are FIXED-POINT integer −log2 values computed by
  * an exact 16-step squaring algorithm ([[log2Fix]]) that a second
  * engine replays bit-for-bit in SQL — the algorithm's truncation
  * behavior IS the definition, so cross-engine equality is structural,
  * not a rounding accident. The Viterbi tie-break is total
  * (cost asc, piece-count asc, last-piece-length desc), making the
  * segmentation — not just its score — reproducible everywhere.
  */
object UnigramLm {

  /** Longest candidate piece (SentencePiece's max_sentencepiece_length
    * knob, here fixed so the oracle's DP unroll is bounded).
    */
  val MaxPieceLen = 4

  /** Multi-character vocabulary budget after pruning; single characters
    * are always kept on top of this (SentencePiece's character-coverage
    * floor), so every word stays segmentable.
    */
  val VocabMulti = 64

  /** DP/oracle word-length bound — a loud contract, not a truncation:
    * the testdata dict maxes at 8 chars; a corpus with longer words
    * needs the unrolled oracle widened in lockstep.
    */
  val MaxWordLen = 12

  /** Fractional bits of the fixed-point log2. */
  val LogFracBits = 16

  private val MantBits = 30

  /** Exact fixed-point ⌊2^16·log2(x)⌋-shaped value via 16 squaring
    * steps on a 30-bit mantissa. The truncation at each step makes this
    * differ from the true log by < 2 ulp — IRRELEVANT: both engines run
    * the SAME integer recurrence, so the values (and every comparison
    * built on them) agree exactly. Domain x ∈ [1, 2^32): y·y and x<<30
    * must stay inside signed 64-bit in BOTH engines (DuckDB BIGINT
    * errors on overflow rather than wrapping, which would surface a
    * violation loudly).
    */
  def log2Fix(x: Long): Long = {
    require(x >= 1 && x < (1L << 32), s"log2Fix domain violation: $x")
    val n = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var y = (x << MantBits) >> n // mantissa in [2^30, 2^31)
    var bits = 0L
    var i = 0
    while (i < LogFracBits) {
      y = (y * y) >> MantBits // < 2^62 before the shift — no overflow
      if (y >= (1L << (MantBits + 1))) { bits = (bits << 1) | 1; y >>= 1 }
      else bits <<= 1
      i += 1
    }
    (n.toLong << LogFracBits) | bits
  }

  /** A Viterbi segmentation: total integer cost, piece count, and the
    * piece LENGTHS in order (the cut list — pieces are recovered by
    * slicing the word at the cumulative cuts).
    */
  final case class Seg(cost: Long, k: Int, cuts: List[Int])

  /** Viterbi-segment one word under integer piece costs. Tie-break at
    * every DP cell: (cost asc, piece count asc, last-piece length desc)
    * — a TOTAL order over candidates (two candidates with equal length
    * share predecessor state and piece, hence are identical), so the
    * chosen segmentation is engine-independent. Throws loudly when a
    * position is unreachable (a character outside the vocabulary — the
    * character-coverage contract was violated upstream).
    */
  def viterbi(word: String, cost: collection.Map[String, Long]): Seg = {
    require(word.length >= 1 && word.length <= MaxWordLen,
      s"word '$word' outside the [1, $MaxWordLen] contract " +
        "(widen MaxWordLen and the oracle unroll together)")
    val best = new Array[Seg](word.length + 1)
    best(0) = Seg(0L, 0, Nil)
    var j = 1
    while (j <= word.length) {
      var b: Seg = null
      var bl = 0
      var l = 1
      val lMax = math.min(MaxPieceLen, j)
      while (l <= lMax) {
        val prev = best(j - l)
        if (prev != null) {
          cost.get(word.substring(j - l, j)) match {
            case Some(c) =>
              val cc = prev.cost + c
              val kk = prev.k + 1
              if (b == null || cc < b.cost ||
                  (cc == b.cost && (kk < b.k || (kk == b.k && l > bl)))) {
                b = Seg(cc, kk, prev.cuts :+ l)
                bl = l
              }
            case None =>
          }
        }
        l += 1
      }
      best(j) = b
      j += 1
    }
    val out = best(word.length)
    require(out != null,
      s"word '$word' unsegmentable — character outside the vocabulary")
    out
  }

  /** Occurrence-weighted substring counts (lengths 1..MaxPieceLen) over
    * the word dict — the seed candidate vocabulary. Dict-scale: the
    * explode is ≤ MaxPieceLen·|word| rows per DICT TYPE, never per
    * corpus occurrence.
    */
  def seedCounts(dict: DataFrame): DataFrame =
    dict
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("n"), col("i"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("i") + 1)))
          .as("l"))
      .select(expr("substring(word, i, l)").as("piece"), col("n"))
      .groupBy("piece").agg(sum(col("n")).as("n"))

  /** Prune to the kept vocabulary: top [[VocabMulti]] multi-character
    * pieces by (count desc, piece asc) — an integer/lexicographic total
    * order, so the boundary is deterministic — plus every single
    * character (the coverage floor). Returns (piece, n).
    */
  def keptVocab(seed: DataFrame): DataFrame =
    seed.filter(length(col("piece")) > 1)
      .orderBy(col("n").desc, col("piece")).limit(VocabMulti)
      .unionByName(seed.filter(length(col("piece")) === 1))

  /** The learned piece table: seed → prune → ONE hard-EM round
    * (Viterbi E-step over the dict under seed costs, occurrence-weighted
    * count M-step). Returns (piece, seed_n, em_n) — em_n is 0 for kept
    * pieces the Viterbi never chose (they survive in the table; the
    * tokenize tier's add-one smoothing keeps them usable). The collect
    * is the bounded model table (VocabMulti + alphabet rows).
    */
  def learn(dict: DataFrame): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val kept = keptVocab(seedCounts(dict))
    val model = kept.collect().map(r => r.getString(0) -> r.getLong(1))
    val costs = costMap(model)
    val bCosts = spark.sparkContext.broadcast(costs)
    val emCounts = dict.select(col("word"), col("n")).as[(String, Long)]
      .mapPartitions(_.flatMap { case (w, n) =>
        pieces(w, viterbi(w, bCosts.value)).map(_ -> n)
      })
      .toDF("piece", "n")
      .groupBy("piece").agg(sum(col("n")).as("em_n"))
    kept.select(col("piece"), col("n").as("seed_n"))
      .join(emCounts, Seq("piece"), "left")
      .select(col("piece"), col("seed_n"),
        coalesce(col("em_n"), lit(0L)).as("em_n"))
  }

  /** Integer piece costs from a (piece, count) table: cost =
    * log2Fix(N) − log2Fix(c), N = Σc — the −log2 of the unigram
    * probability in shared fixed point.
    */
  def costMap(model: Array[(String, Long)]): Map[String, Long] = {
    val n = model.map(_._2).sum
    val ln = log2Fix(n)
    model.map { case (p, c) => p -> (ln - log2Fix(c)) }.toMap
  }

  /** Piece strings of a segmentation (slice the word at the cuts). */
  def pieces(word: String, seg: Seg): List[String] = {
    var s = 0
    seg.cuts.map { l => val p = word.substring(s, s + l); s += l; p }
  }

  /** Per-word piece counts of `dict` under the FINAL (add-one smoothed)
    * learned table — the (word, k) relation corpus tokenization joins.
    */
  def wordFertility(dict: DataFrame,
      learned: Array[(String, Long)]): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    // add-one smoothing: pieces the EM zeroed stay reachable, and the
    // cost domain stays ≥ 1 — defined identically in the oracle
    val costs = costMap(learned.map { case (p, c) => (p, c + 1) })
    val bCosts = spark.sparkContext.broadcast(costs)
    dict.select(col("word")).distinct().as[String]
      .mapPartitions(_.map(w => (w, viterbi(w, bCosts.value).k.toLong)))
      .toDF("word", "k")
  }

  /** Per-document tokenization statistics under a learned table:
    * (doc_id, n_words, n_pieces, fertility_ppm). The corpus is touched
    * once (the word explode); every DP ran at dict scale inside
    * [[wordFertility]].
    */
  def tokenizeStats(docs: DataFrame, wordK: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val perDoc = words.join(wordK, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_pieces"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        expr("(1000000 * coalesce(n_pieces, 0L)) " +
          "DIV greatest(coalesce(n_words, 0L), 1L)").as("fertility_ppm"))
  }

  /** learn + tokenize in one call — the in-query tier (q236). The dict
    * is materialized once: seed counting, the E-step, and the fertility
    * map all re-read it (three dict-scale consumers, ONE corpus
    * aggregate).
    */
  def tokenizeCorpus(docs: DataFrame): DataFrame = {
    val dict = TextDedup.maybeMaterialize(Bpe.wordDict(docs, "text"))
    val learned = learn(dict).collect()
      .map(r => r.getString(0) -> r.getLong(2))
    tokenizeStats(docs, wordFertility(dict, learned))
  }
}
