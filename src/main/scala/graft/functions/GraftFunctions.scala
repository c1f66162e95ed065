package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's function family (SURVEY §4.2):
  * after `GraftFunctions.registerAll(spark)`, every capability is callable
  * from `spark.sql(...)` as well as the Column API.
  *
  * Native expressions register through the FunctionRegistry (stay
  * codegen/eval-native, no UDF wrapping); the HTML family registers as
  * struct-returning UDFs.
  */
object GraftFunctions {

  private def arity[A](name: String, n: Int)(
      build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => A):
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] => A =
    exprs => {
      require(exprs.length == n,
        s"$name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    reg.createOrReplaceTempFunction("graft_dot",
      arity("graft_dot", 2)(exprs => DotProduct(exprs(0), exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      arity("graft_minhash", 2)(exprs => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Int])), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      arity("graft_simhash", 1)(exprs => SimHash64(exprs(0))), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      arity("graft_shingles", 2)(exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])), "built-in")
    reg.createOrReplaceTempFunction("graft_overlap",
      arity("graft_overlap", 2)(exprs =>
        SortedOverlapCount(exprs(0), exprs(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      arity("graft_bloom_contains", 2)(exprs =>
        graft.ops.Bloom.BloomMightContain(exprs(0), exprs(1))), "built-in")
    // aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry in an AggregateExpression, same as the built-in aggregates
    reg.createOrReplaceTempFunction("graft_frequent_items",
      arity("graft_frequent_items", 2)(exprs =>
        MisraGriesTopK(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())),
      "built-in")
    // column-composition builders (not custom Expressions): the builder
    // emits the SAME unresolved tree the Column API would produce
    // (TextAnalysis.*Expr — parsed template + argument splice), the
    // analyzer finishes resolution — still UDF-free, fully codegen'd
    reg.createOrReplaceTempFunction("graft_winnow_select",
      arity("graft_winnow_select", 3)(exprs =>
        TextAnalysis.winnowSelectExpr(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())), "built-in")
    reg.createOrReplaceTempFunction("graft_run_entropy",
      arity("graft_run_entropy", 1)(exprs =>
        TextAnalysis.runEntropySumExpr(exprs(0))), "built-in")

    // the remaining text formulas, also as splice builders (these were
    // UDF wrappers before the parsed-template technique existed — now
    // every registered function is UDF-free except the HTML parsers).
    // NULL contract (differs from the retired UDF wrappers, which
    // returned 0/"und"/0 on NULL): these follow SQL null propagation —
    // graft_token_count(NULL) and graft_quality_ppm(NULL) are NULL,
    // graft_lang_id(NULL) is 'und' (its CASE falls through to the ELSE
    // branch). The Column twins share the same trees, so SQL ≡ Column
    // holds on NULL too — asserted by SqlSurfaceSpec's NULL-input case.
    // The corpus itself has no NULL text (documents.text is generated
    // non-null), so no query result depends on the choice.
    reg.createOrReplaceTempFunction("graft_token_count",
      arity("graft_token_count", 1)(exprs =>
        TextAnalysis.tokenCountExpr(exprs(0))), "built-in")
    reg.createOrReplaceTempFunction("graft_lang_id",
      arity("graft_lang_id", 1)(exprs =>
        TextAnalysis.langIdExpr(exprs(0))), "built-in")
    reg.createOrReplaceTempFunction("graft_quality_ppm",
      arity("graft_quality_ppm", 1)(exprs =>
        TextAnalysis.qualityScorePpmExpr(exprs(0))), "built-in")
    reg.createOrReplaceTempFunction("graft_split",
      arity("graft_split", 1)(exprs =>
        TextAnalysis.splitExpr(exprs(0))), "built-in")
    // the codec tier's SQL surface (binary -> decoded struct): native
    // expressions over the from-scratch PPM/PNG/WAV decoders
    reg.createOrReplaceTempFunction("graft_image_stats",
      arity("graft_image_stats", 1)(exprs =>
        ImageStatsExpr(exprs(0))), "built-in")
    reg.createOrReplaceTempFunction("graft_audio_stats",
      arity("graft_audio_stats", 1)(exprs =>
        AudioStatsExpr(exprs(0))), "built-in")
    // content-defined chunking (rolling polynomial window hash, one
    // pass per row — the q193/q194 kernel)
    reg.createOrReplaceTempFunction("graft_cdc_chunks",
      arity("graft_cdc_chunks", 1)(exprs =>
        CdcChunksExpr(exprs(0))), "built-in")

    JobParse.register(spark)
  }
}

/** Plain-Scala evaluations of the TextAnalysis formulas for the SQL UDF
  * surface (and as an independent cross-check of the Column formulations —
  * see TextAnalysisParitySpec).
  */
object TextAnalysisEval {

  def tokens(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array("") else t.split("\\s+")
  }

  def tokenCount(s: String): Int = tokens(s).length

  def stopwordRatio(s: String, lang: String): Double = {
    val toks = tokens(s)
    val list = TextAnalysis.stopwords(lang).toSet
    toks.count(list.contains).toDouble / math.max(toks.length, 1)
  }

  def langId(s: String): String = {
    if (s == null) return "und"
    val langs = Seq("en", "de", "fr", "es")
    val ratios = langs.map(l => l -> stopwordRatio(s, l))
    val best = ratios.map(_._2).max
    if (best <= 0d) "und" else ratios.find(_._2 == best).map(_._1).getOrElse("und")
  }

  // Same character classes as TextAnalysis.punctCount's [^A-Za-z0-9\s]
  // (Java \s = ASCII whitespace) so the SQL UDF and Column API agree on
  // non-ASCII text; Character.isLetterOrDigit would diverge on e.g. 'é'.
  private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def qualityPpm(s: String): Long = {
    if (s == null) return 0L
    val M = 1000000L
    val len = s.length.toLong
    val toks = math.max(tokenCount(s), 1).toLong
    val punct = s.count(c => !isAsciiAlnum(c) && !isAsciiSpace(c)).toLong
    val stops = {
      val list = TextAnalysis.stopwords("en").toSet
      tokens(s).count(list.contains).toLong
    }
    val lenScore = math.min(len * M / 500L, M)
    val punctScore = M - punct * M / math.max(len, 1L)
    val stopScore = math.min(stops * 4L * M / toks, M)
    val tokScore = math.min(len * M / (toks * 8L), M)
    (lenScore + punctScore + stopScore + tokScore) / 4L
  }
}
