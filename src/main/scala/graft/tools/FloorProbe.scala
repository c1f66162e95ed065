package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val gcTime = new AtomicLong; val serTime = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskTime.addAndGet(t.taskMetrics.executorRunTime)
          gcTime.addAndGet(t.taskMetrics.jvmGCTime)
          serTime.addAndGet(t.taskMetrics.executorDeserializeTime + t.taskMetrics.resultSerializationTime)
        }
      }
    })
    graft.SparkEntry.queries("q13_star_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (name <- Seq("q13_star_join", "q28_pricing_summary", "q55_normalize")) {
      (1 to 3).foreach { rep =>
        jobs.set(0); stages.set(0); tasks.set(0); taskTime.set(0); gcTime.set(0); serTime.set(0)
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.ops.Materialize.releaseAll(spark)
        println(f"[floor] $name%-24s#$rep wall=$wall%6.3f jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%4d taskSum=${taskTime.get / 1000.0}%7.3f gc=${gcTime.get / 1000.0}%5.2f ser=${serTime.get / 1000.0}%5.2f")
        System.gc(); Thread.sleep(50)
      }
    }
    spark.stop()
  }
}
