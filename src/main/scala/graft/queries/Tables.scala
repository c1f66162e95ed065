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
  /** The events table carries parquet TIMESTAMP(NANOS). How Spark scans it
    * depends on version: with spark.sql.legacy.parquet.nanosAsLong=true the
    * column arrives as LongType (nanos since epoch; Spark ≤4.0), while Spark
    * 4.1+ reads NANOS natively as TIMESTAMP_NTZ and ignores the legacy flag.
    * This reader normalizes both to a session-zoned TimestampType (µs):
    * LongType → integer `DIV 1000` (a double division would lose precision
    * at 1e18 ns) → timestamp_micros; TimestampNTZType → cast (the UTC
    * session preserves the instant). Downstream queries and the DuckDB
    * oracle see the identical µs timeline either way.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(apply(s, d, "events"))

  /** Normalize the scanned `ts` to TimestampType whatever shape the scan
    * produced (shared by the batch reader above and the streaming reader in
    * graft.streaming.EventStream, which sees the same parquet files).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(s"events.ts: unexpected parquet-scanned type $other")
    }
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
