package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap sessionization — the streaming twin of
  * graft.operators.Sessionize.
  *
  * A session closes when event time advances past its last event by
  * more than the gap. In a stream that decision needs the watermark:
  * state per user is ONE open session (O(1) — bounded regardless of
  * user count × history, the property that matters when the event log
  * is the 100 TB table), and a session is emitted exactly once, when
  * the event-time timeout fires after `lastEvent + gap` passes the
  * watermark. In-batch events are processed in event-time order;
  * late events inside the watermark extend or split sessions exactly
  * like batch; events later than the watermark are dropped upstream
  * by `withWatermark` (the standard streaming trade-off, documented
  * here rather than hidden).
  */
object StreamingSessions {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class OpenSession(
      sessionIdx: Long,
      tsStart: Long, // micros
      tsEnd: Long,
      nEvents: Long,
      types: Set[String],
      valueCents: Long,
  )

  final case class Session(
      user_id: Long,
      session_idx: Long,
      ts_start: Timestamp,
      ts_end: Timestamp,
      n_events: Long,
      n_event_types: Long,
      value_cents: Long,
  )

  /** @param events streaming frame with user_id/ts/event_type/value
    * @param gapMinutes session gap; also sizes the event-time timeout
    * @param watermark lateness horizon (must be >= expected disorder)
    */
  def sessions(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "2 hours",
  ): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(
        col("user_id").cast("long"),
        col("ts").cast("timestamp"),
        col("event_type").cast("string"),
        col("value").cast("double"),
      )
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        processUser(gapUs)
      )
  }

  private def processUser(gapUs: Long)(
      user: Long,
      rows: Iterator[Event],
      state: GroupState[OpenSession],
  ): Iterator[Session] = {
    val out = Seq.newBuilder[Session]
    var open = state.getOption.orNull

    def close(s: OpenSession): Unit =
      out += Session(
        user,
        s.sessionIdx,
        StatefulBars.microsTs(s.tsStart),
        StatefulBars.microsTs(s.tsEnd),
        s.nEvents,
        s.types.size.toLong,
        s.valueCents,
      )

    if (rows.isEmpty && state.hasTimedOut) {
      // watermark passed lastEvent + gap: the open session is final
      if (open != null) close(open)
      state.remove()
      return out.result().iterator
    }

    val sorted = rows.toSeq.sortBy(e => (StatefulBars.tsMicros(e.ts), e.event_type))
    sorted.foreach { e =>
      val us = StatefulBars.tsMicros(e.ts)
      val cents = math.floor(e.value * 100).toLong
      open =
        if (open == null)
          OpenSession(0L, us, us, 1L, Set(e.event_type), cents)
        else if (us > open.tsEnd + gapUs) {
          close(open)
          OpenSession(open.sessionIdx + 1L, us, us, 1L, Set(e.event_type), cents)
        } else
          OpenSession(
            open.sessionIdx,
            open.tsStart,
            math.max(open.tsEnd, us),
            open.nEvents + 1L,
            open.types + e.event_type,
            open.valueCents + cents,
          )
    }
    state.update(open)
    // fire once the watermark passes the open session's close horizon
    state.setTimeoutTimestamp(open.tsEnd / 1000L + gapUs / 1000L + 1L)
    out.result().iterator
  }
}
