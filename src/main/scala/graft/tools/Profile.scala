package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the bench hotspots: times each sub-stage of
  * the expensive queries at a given SF so optimization targets measurement,
  * not guesswork. Run:
  *   sbt -batch "runMain graft.tools.Profile /root/testdata/sf0.1"
  */
object Profile {
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

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def timeCount(name: String)(df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      n
    }

    import graft.queries.Tables
    import graft.functions.TextAnalysis
    import graft.ops.{Similarity, TextDedup}

    // warm-up
    graft.queries.CoreQueries.queries("q13_star_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    println("=== q18 phases (mirrors TextDedup.ngramJaccardPairs) ===")
    // NOTE: an array-local reformulation (left-join df≥2 freq + groupBy
    // collect_list + sort_array + slice/explode) was A/B-tested at sf0.1 and
    // lost 3-4× to this window form on the high-df corpus (collect_list
    // shuffles full buffers; the window rank pipelines) — keep the window.
    val docs = Tables.documents(spark, sfDir)
    val sh = docs.select(col("doc_id").as("id"), col("lang").as("block"),
        sort_array(TextAnalysis.shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0).localCheckpoint()
    timeCount("q18.sh(ckpt)")(sh)
    val exploded = sh.select(col("id"), col("block"),
      size(col("sh")).as("nsz"), explode(col("sh")).as("s"))
    val freq = exploded.groupBy("s").agg(count(lit(1)).as("df"))
    timeCount("q18.freq")(freq)
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("df", "s")
    val prefixRows = exploded.join(freq, "s")
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <=
        (col("nsz") - ceil(col("nsz") * 0.5 - 1e-9) + 1).cast("int"))
      .select(col("id"), col("block"), col("nsz"), col("rn"),
        xxhash64(col("s")).as("p")).localCheckpoint()
    timeCount("q18.prefixRows(ckpt)")(prefixRows)
    val overlapNeeded = ceil((col("a.nsz") + col("b.nsz")) * (0.5 / 1.5) - 1e-9)
    val a = prefixRows.as("a")
    val b = prefixRows.as("b")
    val candidates = a.join(b,
        col("a.p") === col("b.p") && col("a.block") === col("b.block") &&
          col("a.id") < col("b.id") &&
          col("a.nsz") * 0.5 <= col("b.nsz") + 1e-9 &&
          col("b.nsz") * 0.5 <= col("a.nsz") + 1e-9 &&
          (least(col("a.rn"), col("b.rn")) +
            least(col("a.nsz") - col("a.rn"), col("b.nsz") - col("b.rn")))
            >= overlapNeeded)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    timeCount("q18.candidates")(candidates)
    val verified = candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a"),
        size(col("sh")).as("na")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b"),
        size(col("sh")).as("nb")), "id_b")
      .withColumn("ov", graft.functions.SketchExpressions
        .sortedOverlapCount(col("sh_a"), col("sh_b")))
      .filter(col("ov").cast("double") /
        (col("na") + col("nb") - col("ov")).cast("double") >= 0.5)
    timeCount("q18.verified")(verified)
    time("q18.full")(graft.queries.ExtensionQueries.q18_ngram_jaccard(spark, sfDir))
    time("q56.full")(graft.queries.ExpansionQueries.q56_dedup_groups(spark, sfDir))

    println("=== q21 phases ===")
    val emb = Tables.embeddings(spark, sfDir)
    val q = broadcast(emb.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
      .filter(col("qn") > 0d))
    val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", Similarity.l2norm(col("cv")))
      .filter(col("cn") > 0d)
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("cos"))
    timeCount("q21.scored")(scored)
    val agged = scored.groupBy("query_id")
      .agg(max(struct(col("cos"), (-col("neighbor_id")).as("neg_id"))).as("best"))
    timeCount("q21.agg")(agged)
    time("q21.full")(graft.queries.ExtensionQueries.q21_cosine_top1(spark, sfDir))

    println("=== q32 phases ===")
    locally {
      val t0 = System.nanoTime()
      val sample = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .orderBy(col("vec_id")).limit(512)
        .collect().map(_.getSeq[Double](1).toArray)
        .filter(v => v.exists(_ != 0d))
      println(f"[profile] q32.sample+collect          ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      val t1 = System.nanoTime()
      val centroids = {
        val m = graft.ops.Similarity.getClass.getDeclaredMethods
          .find(_.getName == "sphericalKMeans").get
        m.setAccessible(true)
        m.invoke(graft.ops.Similarity, sample, Int.box(16), Int.box(5))
          .asInstanceOf[Seq[Array[Double]]]
      }
      println(f"[profile] q32.kmeans                  ${(System.nanoTime() - t1) / 1e9}%8.3f s")
      def centroidDots(v: org.apache.spark.sql.Column) = centroids.zipWithIndex.map {
        case (cd, j) => struct(Similarity.dot(v, array(cd.map(lit).toIndexedSeq: _*)).as("d"),
          lit(j).as("j"))
      }
      val vecs = emb.select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", Similarity.l2norm(col("v")))
        .filter(col("nrm") > 0d)
      val assigned = vecs.withColumn("cluster",
        sort_array(array(centroidDots(col("v")): _*), asc = false)(0).getField("j"))
      timeCount("q32.assigned")(assigned)
      val probes = vecs.select(col("id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"),
          explode(slice(sort_array(array(centroidDots(col("v")): _*), asc = false),
            1, 2)).as("p"))
        .select(col("query_id"), col("qv"), col("qn"), col("p.j").as("cluster"))
      timeCount("q32.probes")(probes)
      val scored = probes.join(
          assigned.select(col("id").as("neighbor_id"), col("v").as("cv"),
            col("nrm").as("cn"), col("cluster")),
          Seq("cluster"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("cos"))
      timeCount("q32.scored")(scored)
      time("q32.scored-noop")(scored)
    }
    time("q32.full")(graft.queries.ExtensionQueries.q32_ivf_cosine(spark, sfDir))
    println("=== q26 phases ===")
    time("q26.full")(graft.queries.ExtensionQueries.q26_lsh_cosine(spark, sfDir))
    println("=== q19 phases ===")
    time("q19.full")(graft.queries.ExtensionQueries.q19_minhash_lsh(spark, sfDir))
    println("=== round-2 additions (2 reps each) ===")
    (1 to 2).foreach { rep =>
      time(s"q53.full#$rep")(graft.queries.ExpansionQueries.q53_embedding_neardup(spark, sfDir))
      time(s"q55.full#$rep")(graft.queries.ExpansionQueries.q55_normalize(spark, sfDir))
      time(s"q56.full#$rep")(graft.queries.ExpansionQueries.q56_dedup_groups(spark, sfDir))
      time(s"q60.full#$rep")(graft.queries.ExpansionQueries.q60_hll_merge(spark, sfDir))
    }

    spark.stop()
  }
}
