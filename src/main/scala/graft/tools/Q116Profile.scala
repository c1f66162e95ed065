package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the q116 probe/count pieces. */
object Q116Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{Similarity, TextDedup}
    import graft.queries.{Tables, TokenizerQueries}

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q116p] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    // warm-up
    Tables.lineitem(spark, d).count()

    val emb = Tables.embeddings(spark, d)
    val docs = Tables.documents(spark, d)
    val embHead = emb
      .filter(expr("exists(embedding, x -> x <> 0.0F)"))
      .orderBy("vec_id").limit(256)
    var probeEmb: DataFrame = null
    t("probeEmb.ckpt") {
      probeEmb = TextDedup.maybeMaterialize(embHead.unionByName(
        embHead.orderBy("vec_id").limit(1).withColumn("vec_id", lit(-1L))))
    }
    val docsHead = docs
      .filter(size(split(trim(col("text")), "\\s+")) >= 3)
      .orderBy("doc_id").limit(64)
    var probeDocs: DataFrame = null
    t("probeDocs.ckpt") {
      probeDocs = TextDedup.maybeMaterialize(docsHead.unionByName(
        docsHead.orderBy("doc_id").limit(1).withColumn("doc_id", lit(-1L))))
    }
    var scored: DataFrame = null
    t("scored.ckpt") {
      scored = TextDedup.maybeMaterialize(
        Similarity.lshScoredPairs(probeEmb, "vec_id", "embedding", dim = 64))
    }
    def ne(df: DataFrame): Unit = {
      df.select(lit(1L).as("one")).limit(1)
        .agg((count(lit(1)) >= 1L).cast("long").as("population")).collect()
    }
    t("probe.lsh_topk")(ne(Similarity.lshCosineTopKFromScored(scored, k = 1)))
    t("probe.ivf")(ne(Similarity.ivfTopK(probeEmb, "vec_id", "embedding",
      k = 1, dim = 64, nClusters = 4, sampleSize = 64, iters = 2)))
    t("probe.ivfpq")(ne(Similarity.ivfPqTopK(probeEmb, "vec_id", "embedding",
      k = 1, dim = 64, nClusters = 4, pqK = 8, rerank = 2, sampleSize = 64,
      iters = 2)))
    t("probe.neardup")(ne(scored))
    t("count.bm25")(TokenizerQueries.keywordMatchCore(spark, d).count())
    t("count.hll_months")(Tables.orders(spark, d)
      .select(date_trunc("MONTH", col("o_orderdate"))).distinct().count())
    t("count.returnflags")(Tables.lineitem(spark, d)
      .select("l_returnflag").distinct().count())
    val sh = TextDedup.shingleRelation(docs, "doc_id", "text", lit(""), 3)
    t("count.shingled")(sh.count())
    val probeSh = TextDedup.shingleRelation(probeDocs, "doc_id", "text",
      lit(""), 3)
    t("probe.minhash")(ne(TextDedup.minhashLshPairsFromShingles(probeSh,
      numHashes = 48, bands = 8, threshold = 0.5)))
    t("probe.simhash")(ne(TextDedup.simhashPairs(probeDocs, "doc_id", "text",
      maxDist = 6)))
    spark.stop()
  }
}
