package graft.tools
import org.apache.spark.sql.SparkSession
object JobOverheadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // warm
    (1 to 5).foreach(_ => spark.range(100).toDF("x").write.format("noop").mode("overwrite").save())
    def bench(name: String)(body: => Unit): Unit = {
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
      println(f"[joh] $name%-34s min=${ts.min}%7.4f  med=${ts.sorted.apply(3)}%7.4f")
    }
    bench("range100.noop") {
      spark.range(100).toDF("x").write.format("noop").mode("overwrite").save()
    }
    bench("range100.count") { spark.range(100).count() }
    bench("rdd.emptyJob") { spark.sparkContext.parallelize(1 to 32, 32).count() }
    bench("range.groupBy.noop") {
      spark.range(10000).toDF("x").groupBy(($"x" % 10).as("k")).count()
        .write.format("noop").mode("overwrite").save()
    }
    bench("range.groupBy.orderBy.noop") {
      spark.range(10000).toDF("x").groupBy(($"x" % 10).as("k")).count()
        .orderBy("k").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
