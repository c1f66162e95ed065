package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-17 measurement harness (guide §1: measure first).
  *
  *   java -cp ... graft.tools.R17Probe <sfDir> <queryRegex> [phaseRegex]
  *
  * For every declared query matching `queryRegex`: min-of-3 noop-sink wall
  * time plus the job/stage/task counts and summed task time of the LAST
  * rep — how much of a query's wall is serial driver floor (jobs × ~68 ms
  * + AQE stages × ~100 ms, JobOverheadProbe) vs executor compute.
  * `phaseRegex` additionally runs the named phase decompositions below
  * (sub-pipelines of the expensive queries, timed the same way).
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queryRe = args.lift(1).getOrElse("^$").r
    val phaseRe = args.lift(2).map(_.r)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskTime = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskTime.addAndGet(t.taskMetrics.executorRunTime)
      }
    })

    def t(name: String)(mk: => DataFrame): Unit = {
      val walls = (1 to 3).map { _ =>
        jobs.set(0); stages.set(0); tasks.set(0); taskTime.set(0)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        graft.ops.Materialize.releaseAll(spark)
        System.gc(); Thread.sleep(50)
        w
      }
      println(f"[r17] $name%-34s min=${walls.min}%6.3f (${walls.map(x => f"$x%.2f").mkString(",")}) jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d taskSum=${taskTime.get / 1000.0}%7.3f")
    }

    // warm-up
    graft.SparkEntry.queries("q13_star_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    for (n <- graft.SparkEntry.queries.keys.toSeq.sorted
        if queryRe.findFirstIn(n).isDefined) {
      if (n.startsWith("q1") && n.contains("state") ||
          Seq("q116", "q121", "q144", "q166").exists(n.startsWith))
        graft.queries.TokenizerQueries.ensurePostingState(spark, sfDir)
      t(n)(graft.SparkEntry.queries(n)(spark, sfDir))
    }

    def phase(name: String)(body: => Unit): Unit =
      if (phaseRe.exists(_.findFirstIn(name).isDefined)) { println(s"=== $name ==="); body }

    import graft.queries.Tables
    import graft.ops.TextDedup
    lazy val docs = Tables.documents(spark, sfDir)

    phase("q56") {
      t("q56.pairs_only")(TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        "lang", 3, 0.5).select("id_a", "id_b"))
      t("q56.cc_full")(TextDedup.dedupClusterRelation(docs, "doc_id", "text",
        "lang", 3, 0.5))
      // CC over pre-materialized pairs: isolates the loop cost from the
      // pair pipeline (sym's checkpoint re-reads blocks, not the pipeline)
      t("q56.cc_loop_only") {
        val pairs = graft.ops.Materialize(
          TextDedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 3, 0.5)
            .select("id_a", "id_b"))
        graft.ops.Components.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs)
      }
    }

    phase("q166") {
      val dir = graft.queries.TokenizerQueries.ensurePostingState(spark, sfDir)
      t("q166.probe_fp_only")(
        graft.queries.ExtensionQueries.winnowFpKeys(docs))
      t("q166.overlap_unsorted")(
        graft.pipeline.CorpusBuild.stateSplitLeakage(spark, dir, docs))
    }

    phase("q117") {
      import graft.functions.TextAnalysis
      import graft.ops.Packing
      val counts = docs.select(col("doc_id"),
        Packing.shuffleKey(col("doc_id"), 20).as("skey"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"),
        lit("all").as("mix"))
      t("q117.pack_only")(Packing.packSequences(counts, "skey", "mix",
        "n_toks", seqLen = 2048L, shardRows = 1L << 52)
        .select("doc_id", "skey", "n_toks", "seq_id", "seq_offset"))
    }

    phase("q116") {
      import graft.ops.{Similarity, TextDedup}
      import graft.queries.{ExtensionQueries, TokenizerQueries}
      import graft.queries.SharedAnn
      val d = sfDir
      val s = spark
      TokenizerQueries.ensurePostingState(s, d)
      val emb = Tables.embeddings(s, d)
      def exactCount(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("population"))
          .select(lit(name).as("gate"), col("population"))
      def nonempty(name: String, df: DataFrame): DataFrame =
        df.select(lit(1L).as("one")).limit(1)
          .agg((count(lit(1)) >= 1L).cast("long").as("population"))
          .select(lit(name).as("gate"), col("population"))
      val embHead = emb
        .filter(expr("exists(embedding, x -> x <> 0.0F)"))
        .orderBy("vec_id").limit(256)
      def probeEmb = TextDedup.maybeMaterialize(embHead.unionByName(
        embHead.orderBy("vec_id").limit(1).withColumn("vec_id", lit(-1L))))
      val docsHead = docs
        .filter(size(split(trim(col("text")), "\\s+")) >= 3)
        .orderBy("doc_id").limit(64)
      def probeDocs = docsHead.unionByName(
        docsHead.orderBy("doc_id").limit(1).withColumn("doc_id", lit(-1L)))
      // warm the serve memos outside the timers (bench min-of-3 shape)
      Seq("lsh", "ivf", "ivfpq", "state_ivf", "state_ivf_curve")
        .foreach(tier => SharedAnn.serve(s, d, tier).count())
      t("q116.b01_ann_vectors")(exactCount("ann_vectors", emb))
      t("q116.b02_lsh_topk")(nonempty("x", SharedAnn.serve(s, d, "lsh")))
      t("q116.b03_ivf_topk")(nonempty("x", SharedAnn.serve(s, d, "ivf")))
      t("q116.b04_ivfpq_topk")(nonempty("x", SharedAnn.serve(s, d, "ivfpq")))
      t("q116.b05_neardup_scored")(nonempty("x",
        Similarity.lshScoredPairs(probeEmb, "vec_id", "embedding", dim = 64,
          numTables = 2, planesPerTable = 4)))
      t("q116.b06_bm25_match")(exactCount("x",
        TokenizerQueries.serveMatchCore(s, d)))
      t("q116.b07_hll_months")(exactCount("x", Tables.orders(s, d)
        .select(date_trunc("MONTH", col("o_orderdate"))).distinct()))
      t("q116.b08_pct_flags")(exactCount("x",
        Tables.lineitem(s, d).select("l_returnflag").distinct()))
      t("q116.b09_shingled_docs")(exactCount("x",
        docs.filter(size(split(trim(col("text")), "\\s+")) >= 3)))
      t("q116.b10_lsh_pairs")(nonempty("x",
        TextDedup.minhashLshPairsFromShingles(
          TextDedup.shingleRelation(probeDocs, "doc_id", "text", lit(""), 3),
          numHashes = 16, bands = 4, threshold = 0.5)))
      t("q116.b11_simhash_pairs")(nonempty("x",
        TextDedup.simhashPairs(probeDocs, "doc_id", "text", maxDist = 6)))
      t("q116.b12_kmeans_assigned")(exactCount("x",
        ExtensionQueries.sharedKMeans(s, d)._1))
      t("q116.b13_semdedup_pairs")(nonempty("x",
        Similarity.clusterNearDupPairs(probeEmb, "vec_id", "embedding",
          threshold = 0.3, k = 4, iters = 2)))
      t("q116.b14_state_kmeans")(exactCount("x",
        graft.pipeline.CorpusBuild.stateKmeans(s,
          TokenizerQueries.ensurePostingState(s, d))))
      t("q116.b15_state_vecs")(exactCount("x",
        graft.pipeline.CorpusBuild.stateVecs(s,
          TokenizerQueries.ensurePostingState(s, d))))
      t("q116.b16_state_ann")(nonempty("x",
        SharedAnn.serve(s, d, "state_ivf")))
      t("q116.b17_state_curve")(nonempty("x",
        SharedAnn.serve(s, d, "state_ivf_curve")
          .filter(col("nprobe") === 1L)))
    }

    phase("q102") {
      t("q102.occ_only") {
        val ws = graft.functions.TextAnalysis.tokens(col("text"))
        docs.filter(size(ws) >= 5)
          .select(col("doc_id"),
            posexplode(transform(sequence(lit(1), size(ws) - 4),
              i => xxhash64(concat_ws(" ", slice(ws, i, lit(5))))))
              .as(Seq("i0", "shk")))
          .select(col("doc_id"), (col("i0") + 1).as("p"), col("shk"))
      }
      t("q102.toks_only") {
        val ws = graft.functions.TextAnalysis.tokens(col("text"))
        docs.select(col("doc_id"), posexplode(ws).as(Seq("i0", "tok")))
          .select(col("doc_id"), (col("i0") + 1).as("tp"), col("tok"))
          .filter(length(col("tok")) > 0)
      }
    }
    spark.stop()
  }
}
