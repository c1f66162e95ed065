package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tables
import graft.streaming.EventStream

class EventStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("EventStreamSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed counts over the events lake match the batch aggregate") {
    val stream = EventStream.readEventStream(spark, s"$sf")
      .filter(col("event_id").isNotNull) // schema applied to the parquet dir
    val q = EventStream.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = Tables.events(spark, sf)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stateful sessionize agrees with the SQL-window sessionization") {
    import spark.implicits._
    val events = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val stateful = EventStream.sessionize(events, gapMinutes = 30)
      .collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
      .toSet
    val sql = EventStream.sessionizeSql(
        Tables.events(spark, sf).select("event_id", "user_id", "ts"), gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).getTime, r.getTimestamp(3).getTime,
        r.getLong(4)))
      .toSet
    assert(stateful == sql)
  }
}
