package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization probe: quantifies the single-task scan effect.
  * Every sf table is ONE single-row-group parquet file, so all per-row
  * work before the first Exchange runs in one task regardless of core
  * count (guide §2.5's unsplittable-input case). This A/Bs the heavy
  * map tiers as-scanned (1 task) vs repartitioned right after the read.
  * Run: java -cp ... graft.tools.OptProbe /root/testdata/sf0.1
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional section filter: 2nd arg is a regex over probe names;
    // t() calls whose name doesn't match are skipped.
    val sectionRe = args.lift(1).map(_.r)
    def want(name: String): Boolean =
      sectionRe.forall(_.findFirstIn(name).isDefined)

    def t(name: String, reps: Int = 3)(mk: => DataFrame): Unit = {
      if (!want(name)) return
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        graft.ops.Materialize.releaseAll(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-34s min=${ts.min}%7.3f s  (${ts.map(x => f"$x%.2f").mkString(",")})")
    }

    import graft.queries.{Tables, PiiQueries}
    import graft.ops.TextDedup

    // warm-up
    graft.queries.CoreQueries.queries("q13_star_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    println(s"[probe] docs scan partitions = ${docs.rdd.getNumPartitions}")

    t("shingle3.scan1task")(TextDedup.shingleRelation(docs, "doc_id", "text", lit(""), 3))
    t("shingle3.repart32")(TextDedup.shingleRelation(docs.repartition(32), "doc_id", "text", lit(""), 3))

    t("png_decode.scan1task")(
      graft.multimodal.Multimodal.tryDecodeImageStats(
        graft.multimodal.Multimodal.corruptedPngFromText(spark, docs, "doc_id", "text")).toDF())
    t("png_decode.repart32")(
      graft.multimodal.Multimodal.tryDecodeImageStats(
        graft.multimodal.Multimodal.corruptedPngFromText(spark, docs.repartition(32), "doc_id", "text")).toDF())

    t("pii_screen.scan1task")(
      PiiQueries.screened(docs.withColumn("aug", PiiQueries.plantedText), "aug"))
    t("pii_screen.repart32")(
      PiiQueries.screened(docs.repartition(32).withColumn("aug", PiiQueries.plantedText), "aug"))

    // q18 full vs with a pre-repartitioned doc source
    t("q18.full.asis")(graft.queries.ExtensionQueries.q18_ngram_jaccard(spark, sfDir))

    // ---- q18 prefix-filter pipeline phases ----
    println("=== q18 phases ===")
    locally {
      import org.apache.spark.sql.expressions.Window
      def sh() = TextDedup.maybeMaterialize(
        TextDedup.shingleRelation(docs, "doc_id", "text", col("lang"), 3))
      t("q18.shingle_ckpt")(sh())
      t("q18.exploded") {
        sh().select(col("id"), col("block"), size(col("sh")).as("nsz"),
          explode(transform(col("sh"), x => xxhash64(x))).as("p"))
      }
      t("q18.freq") {
        val ex = sh().select(explode(transform(col("sh"), x => xxhash64(x))).as("p"))
        ex.groupBy("p").agg(count(lit(1)).as("df"))
      }
      t("q18.prefixRows") {
        val s0 = sh()
        val exploded = s0.select(col("id"), col("block"), size(col("sh")).as("nsz"),
          explode(transform(col("sh"), x => xxhash64(x))).as("p"))
        val freq = exploded.groupBy("p").agg(count(lit(1)).as("df"))
        val byRarity = Window.partitionBy("id").orderBy("df", "p")
        exploded.join(freq, "p")
          .withColumn("rn", row_number().over(byRarity))
          .filter(col("rn") <=
            (col("nsz") - ceil(col("nsz") * 0.5 - 1e-9) + 1).cast("int"))
      }
      t("q18.pairs_noorder") {
        TextDedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
          n = 3, threshold = 0.5)
      }
      // the final orderBy's range exchange SAMPLES its child — re-running
      // the whole final stage once more. A/B: materialize first vs as-is.
      t("q18.pairs_orderBy") {
        TextDedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
          n = 3, threshold = 0.5).orderBy("id_a", "id_b")
      }
      t("q18.pairs_ckpt_orderBy") {
        graft.ops.Materialize(TextDedup.ngramJaccardPairs(docs, "doc_id",
          "text", "lang", n = 3, threshold = 0.5)).orderBy("id_a", "id_b")
      }
      t("q18.pairs_repart1_sort") {
        TextDedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
          n = 3, threshold = 0.5)
          .repartition(1).sortWithinPartitions("id_a", "id_b")
      }
    }

    // ---- q67 tier phases ----
    println("=== q67 phases ===")
    locally {
      def sh() = TextDedup.maybeMaterialize(
        TextDedup.shingleRelation(docs, "doc_id", "text", lit(""), 3))
      t("q67.lsh_pairs") {
        TextDedup.minhashLshPairsFromShingles(sh(), numHashes = 48,
          bands = 8, threshold = 0.5)
      }
      t("q67.simhash_pairs") {
        TextDedup.simhashPairs(docs, "doc_id", "text", maxDist = 6,
          bands = 10, crossEngine = true)
      }
      t("q67.full")(graft.queries.ExtensionQueries.q67_sketch_precision(spark, sfDir))
    }

    // ---- q179 tier-by-tier ----
    if (want("q179")) {
    println("=== q179 tiers ===")
    locally {
      import org.apache.spark.sql.expressions.Window
      import graft.queries.{ClassifierQueries, FilterQueries, UrlQueries}
      // memo-backed cluster relation: build once first (billed separately)
      val t0 = System.nanoTime()
      val comp0 = graft.ops.TextDedup.dedupClusterRelationShared(
        docs, sfDir, "doc_id", "text", "lang", n = 3, threshold = 0.5)
      comp0.write.format("noop").mode("overwrite").save()
      println(f"[probe] q179.memo_first_build          ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      t("q179.kept_tier") {
        val comp = graft.ops.TextDedup.dedupClusterRelationShared(
          docs, sfDir, "doc_id", "text", "lang", n = 3, threshold = 0.5)
        val byLen = Window.partitionBy("component")
          .orderBy(col("n_chars").desc, col("id"))
        comp.join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
          .withColumn("rk", row_number().over(byLen))
          .filter(col("rk") === 1)
          .select(col("id").as("doc_id"), lit(1L).as("is_kept"))
      }
      t("q179.nb_train_predict") {
        val base = ClassifierQueries.planted(docs)
        val (model, scal) = graft.ops.NaiveBayes.train(
          base.filter(!col("is_test")), "aug", "label")
        graft.ops.NaiveBayes.predict(base, "aug", "doc_id", model, scal)
      }
      t("q179.dsir") {
        FilterQueries.q188_dsir_weights(spark, sfDir)
          .select(col("doc_id"), col("selected"))
      }
      t("q179.full")(graft.queries.ReleaseQueries.q179_release_card(spark, sfDir))
    }
    }

    // ---- q238 / q103 / q116 full (context) ----
    t("q238.full")(graft.queries.TokenizerQueries.queries("q238_fertility_compare")(spark, sfDir))
    t("q103.full")(graft.queries.MixQueries.queries("q103_incremental_cc")(spark, sfDir))

    // ---- q103 phases ----
    if (want("q103.phases")) {
    println("=== q103 phases ===")
    locally {
      val isNew = col("doc_id") % 20 === 0
      val newDocs = docs.filter(isNew)
      val standingDocs = docs.filter(!isNew)
      def phase(name: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        graft.ops.Materialize.releaseAll(spark)
        System.gc(); Thread.sleep(50)
      }
      (1 to 2).foreach { rep =>
        phase(s"q103.shingles#$rep") {
          TextDedup.maybeMaterialize(
            TextDedup.shingleRelation(standingDocs, "doc_id", "text", lit(""), 3))
          TextDedup.maybeMaterialize(
            TextDedup.shingleRelation(newDocs, "doc_id", "text", lit(""), 3))
        }
        phase(s"q103.standingPairs#$rep") {
          val shStand = TextDedup.maybeMaterialize(
            TextDedup.shingleRelation(standingDocs, "doc_id", "text", lit(""), 3))
          TextDedup.minhashLshPairsFromShingles(
              shStand, numHashes = 48, bands = 8, threshold = 0.5)
            .select("id_a", "id_b")
            .write.format("noop").mode("overwrite").save()
        }
        phase(s"q103.standingCC#$rep") {
          val shStand = TextDedup.maybeMaterialize(
            TextDedup.shingleRelation(standingDocs, "doc_id", "text", lit(""), 3))
          val standingPairs = TextDedup.minhashLshPairsFromShingles(
              shStand, numHashes = 48, bands = 8, threshold = 0.5)
            .select("id_a", "id_b")
          graft.ops.Components.connectedComponents(
              standingDocs.select(col("doc_id").as("id")), standingPairs)
            .write.format("noop").mode("overwrite").save()
        }
        phase(s"q103.full#$rep") {
          graft.queries.MixQueries.queries("q103_incremental_cc")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    }

    spark.stop()
  }
}
