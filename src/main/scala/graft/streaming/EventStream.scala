package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream (the batch
  * twins are q22/q23 in graft.queries.Events, which the oracle checks;
  * the specs assert stream/batch equivalence on the same data).
  *
  * Scale notes: watermarked windowed aggregation keeps state bounded to
  * (watermark horizon × group cardinality); sessionization state is one
  * small struct per active user, evicted by event-time timeout. Both
  * shuffle once on their grouping key — identical to the batch plans.
  */
object EventStream {

  /** Streaming twin of q23: epoch-aligned 1-hour tumbling counts per
    * event type, 10-minute watermark for late data. The value sum goes
    * through the same exact-decimal path as the batch twin
    * (graft.queries.Common.dsum) so stream and batch results are
    * bit-identical, not last-ULP-different.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 4)))
          .cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup: duplicates arriving within the watermark
    * horizon are dropped; state is evicted past the watermark, keeping
    * memory bounded (the streaming face of Dedup.exactGroups).
    */
  def dedupeWithinWatermark(events: DataFrame, keyCol: String): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(keyCol)

  /** Stream-stream interval join: purchases joined to same-user clicks
    * within the preceding `windowMinutes`. Both sides carry watermarks,
    * so join state is evicted once the click is older than the interval
    * plus the watermark — bounded memory at any rate.
    */
  def purchasesWithRecentClicks(events: DataFrame, windowMinutes: Int): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") < col("p_ts"))
  }

  case class Ev(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Streaming twin of q22: gap-based sessionization (gapMs of event-time
    * silence closes a session) via flatMapGroupsWithState. Emits closed
    * sessions; open sessions are held as per-user state and flushed on
    * event-time timeout.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, new Timestamp(st.start), new Timestamp(st.end), st.n)

    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _))
            state.remove()
            out.iterator
          } else {
            // Per micro-batch the group's events arrive unordered; fold
            // them in event-time order against the running session.
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.end <= gapMs =>
                  cur = Some(st.copy(end = math.max(st.end, t), n = st.n + 1))
                case Some(st) =>
                  closed += flush(userId, st)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
