package graft.sources

/** S1/S2: the JDBC connector option surface.
  *
  * The reference reads scraped rows from Postgres and appends parsed rows
  * back (/root/reference/spark/ParseHtml.py:33-41 read,
  * ParseHtml.py:74-80 append-mode write). The engine-native storage here is
  * parquet (see [[Sources]]) and this environment has no reachable
  * database, so the live `spark.read.format("jdbc")` call can't be
  * exercised end-to-end — but the option mapping a migrating user needs IS
  * testable without a DB. These builders pin that mapping: hand the
  * returned map to `spark.read.format("jdbc").options(...)` /
  * `df.write.format("jdbc").options(...).mode("append")` unchanged.
  *
  * Scale notes baked into the contract:
  *  - a read without `partitionColumn` bounds is ONE task pulling the whole
  *    table through one connection — fine for a dimension, wrong for a
  *    fact; the (column, lower, upper, n) bounds shard the scan into n
  *    stride queries executed in parallel;
  *  - Spark rejects `query` combined with `partitionColumn` (the stride
  *    predicates need a named relation to wrap) — encode the pushed-down
  *    query as a dbtable subquery alias instead, which is what
  *    [[readOptions]] does automatically;
  *  - `fetchsize`/`batchsize` default to driver-side trickle values in
  *    most JDBC drivers; both are set explicitly.
  */
object Jdbc {

  /** Bounds that shard a JDBC read: WHERE `column` strides over
    * [lower, upper) in `numPartitions` slices. Rows outside the bounds are
    * still read (by the edge slices) — bounds control parallelism, not
    * filtering.
    */
  final case class PartitionBounds(column: String, lower: Long, upper: Long,
      numPartitions: Int) {
    require(numPartitions > 0, "numPartitions must be positive")
    require(lower < upper, "lower bound must be below upper bound")
  }

  /** Options for a (possibly partition-parallel, possibly query-pushdown)
    * JDBC read. A `query` is wrapped as a dbtable subquery so it composes
    * with partition bounds — passing Spark's `query` option alongside
    * `partitionColumn` is rejected by the connector.
    */
  def readOptions(url: String, table: String,
      query: Option[String] = None,
      partition: Option[PartitionBounds] = None,
      fetchSize: Int = 10000,
      extra: Map[String, String] = Map.empty): Map[String, String] = {
    require(url.startsWith("jdbc:"), s"not a jdbc url: $url")
    val relation = query match {
      case Some(q) => s"(${q.stripSuffix(";")}) AS graft_pushdown"
      case None    => table
    }
    val partOpts = partition match {
      case Some(PartitionBounds(c, lo, hi, n)) => Map(
        "partitionColumn" -> c,
        "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString,
        "numPartitions" -> n.toString)
      case None => Map.empty[String, String]
    }
    Map(
      "url" -> url,
      "dbtable" -> relation,
      "fetchsize" -> fetchSize.toString) ++ partOpts ++ extra
  }

  /** Options for the reference's append-mode write (ParseHtml.py:74-80).
    * Use with `.mode("append")`; pair with [[Sources.appendNewKeys]]'s
    * anti-join upstream for the idempotent-ledger contract (plain JDBC
    * append has no ON CONFLICT).
    */
  def writeOptions(url: String, table: String,
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED",
      extra: Map[String, String] = Map.empty): Map[String, String] = {
    require(url.startsWith("jdbc:"), s"not a jdbc url: $url")
    Map(
      "url" -> url,
      "dbtable" -> table,
      "batchsize" -> batchSize.toString,
      "isolationLevel" -> isolationLevel) ++ extra
  }
}
