package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver test corpus (/root/repo/TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The test corpus is one small parquet file per table, which Spark scans
    * as a SINGLE partition. For the scan-then-shuffle relational queries
    * that's fine (the first exchange fans out), but documents/embeddings
    * feed compute-dominated pipelines (shingling, 64-dim dot products) that
    * would serialize on one core — so those two readers rebalance when the
    * scan has fewer partitions than the cluster's parallelism (explicit N so
    * AQE doesn't coalesce the tiny exchange back to one partition). A
    * production-scale scan already has ≥ parallelism partitions, making
    * this a no-op — the guard keeps the 100 TB path shuffle-free. The
    * partition-count probe plans the scan, so it's memoized per path.
    */
  private val scanParts = scala.collection.concurrent.TrieMap.empty[String, Int]
  private def spread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = apply(spark, sfDir, name)
    val target = spark.sparkContext.defaultParallelism
    val parts = scanParts.getOrElseUpdate(s"$sfDir/$name", df.rdd.getNumPartitions)
    if (parts < target) df.repartition(target) else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** The events table carries parquet TIMESTAMP(NANOS) which Spark does not
    * read natively; sessions set spark.sql.legacy.parquet.nanosAsLong=true
    * and this reader restores a proper TimestampType (µs) column. Integer
    * `DIV` keeps full precision (a double division would lose it at 1e18 ns).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(s, d, "events").withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = spread(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = spread(s, d, "embeddings")

  /** Exact, order-insensitive double aggregation: per-row cast to
    * DECIMAL(18,4) (exact at the corpus's 2-decimal inputs and their
    * 4-decimal products), decimal-sum, then one final cast back to double.
    * Matches `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)` in DuckDB, so
    * oracle hashes are reproducible regardless of partitioning / sum order —
    * plain double sums are order-dependent and would flap at 32 partitions.
    */
  def exactSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 4))).cast("double")
  }
}
