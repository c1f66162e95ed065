package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines.
  *
  * All are composed from codegen'd built-ins (`functions._`) — no UDFs — so
  * they stay inside WholeStageCodegen and scale linearly with input: token
  * counting, BPE-ish token estimation, language ID (stopword-ratio
  * heuristic), quality scoring, normalization and MD5 fingerprinting,
  * and word n-gram shingling (the substrate for MinHash / Jaccard dedup).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish estimate: word pieces + isolated punctuation (a regex proxy for
    * subword tokenizers — counts alternating alpha/num runs and symbols).
    */
  def bpeTokenEstimate(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  def charLen(text: Column): Column = length(text)

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Small public stopword lists per language — enough signal for a
    * ratio-based heuristic, cheap enough to inline as literals into codegen.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein", "zu", "auf", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pour", "avec", "sur", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "para", "con", "un", "una", "por"))

  /** Fraction of tokens found in `lang`'s stopword list. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val list = array(stopwords(lang).map(lit): _*)
    size(filter(tokens(text), t => array_contains(list, t))).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")
  }

  /** Language ID: argmax of stopword ratios with a fixed tie-break order
    * (en > de > fr > es > und). 'und' (undetermined) when no list fires.
    */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "fr", "es")
    val ratios = langs.map(l => l -> stopwordRatio(text, l))
    val best = greatest(ratios.map(_._2): _*)
    val caseChain = ratios.foldLeft(when(best <= 0d, lit("und"))) {
      case (acc, (l, r)) => acc.when(r === best, lit(l))
    }
    caseChain.otherwise(lit("und"))
  }

  /** Exact integer floor-division on non-negative longs: (a - a mod b) / b
    * is integer-valued, hence exact in double, hence exact after the cast.
    * (Values stay < 2^53; a plain double a/b could tip a floor at near-
    * integer quotients.)
    */
  private def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Number of tokens present in `lang`'s stopword list. */
  def stopwordHits(text: Column, lang: String): Column = {
    val list = array(stopwords(lang).map(lit): _*)
    size(filter(tokens(text), t => array_contains(list, t)))
  }

  /** Composite quality score scaled to parts-per-million, computed entirely
    * in integer arithmetic so it is bit-identical across engines and
    * partitionings (a double formulation flapped on rounding boundaries):
    * mean of four 0..1e6 components — length saturation (cap 500 chars),
    * punctuation cleanliness, English stopword presence (×4 saturation),
    * mean-token-length sanity (cap 8).
    */
  def qualityScorePpm(text: Column): Column = {
    val M = lit(1000000L)
    val len = charLen(text).cast("long")
    val toks = greatest(tokenCount(text), lit(1)).cast("long")
    val lenScore = least(intDiv(len * M, lit(500L)), M)
    val punctScore = M - intDiv(punctCount(text).cast("long") * M, greatest(len, lit(1L)))
    val stopScore = least(intDiv(stopwordHits(text, "en").cast("long") * 4L * M, toks), M)
    val tokScore = least(intDiv(len * M, toks * 8L), M)
    intDiv(lenScore + punctScore + stopScore + tokScore, lit(4L))
  }

  /** Quality in [0,1]: the exact ppm score over 1e6 (one exact-integer /
    * constant division — deterministic in IEEE double everywhere).
    */
  def qualityScore(text: Column): Column =
    qualityScorePpm(text).cast("double") / 1000000d

  /** Canonical form for fingerprinting: lowercase, strip non-alphanumerics,
    * collapse whitespace.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Document fingerprint: MD5 of the normalized text (portable across
    * engines, unlike xxhash).
    */
  def fingerprintMd5(text: Column): Column = md5(normalizeText(text))

  /** Word n-gram shingles (distinct), the unit set for Jaccard/MinHash.
    * Rows with fewer than n tokens yield an empty set. Native single-pass
    * expression (graft.functions.WordShingles).
    */
  def shingles(text: Column, n: Int): Column =
    SketchExpressions.wordShingles(tokens(text), n)
}
