package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** C71d — STREAMING tail-based trace sampling (the stateful form of
  * Observability.tailSampling C71c: a collector cannot decide "keep
  * this trace?" until the trace is COMPLETE, so per-trace state
  * accumulates spans and the decision fires when the trace goes quiet
  * — the Data-Prepper aggregate/tail-sampler processor re-expressed on
  * `flatMapGroupsWithState`).
  *
  * State per open trace is two scalars (span count, error flag) — not
  * the spans — so memory is O(open traces), and the event-time timeout
  * (watermark + gap) is what closes a trace: no wall-clock in the
  * decision path, so a replay of the same stream makes the same
  * decisions. The keep lottery is the SAME md5-prefix draw the batch
  * operator compiles into its plan (StreamingSpec pins stream/batch
  * decision parity on the same spans).
  */
object TailSampler {

  case class SpanIn(trace_id: String, ts: java.sql.Timestamp,
                    event_id: Long, is_err: Boolean)
  case class TraceState(nSpans: Int, hasErr: Boolean, lastMs: Long)
  case class Decision(trace_id: String, n_spans: Int, has_err: Boolean, keep: Boolean)

  /** The deterministic sampling lottery — byte-identical to the batch
    * plan's `conv(substring(md5(trace_id), 1, 4), 16, 10) < pct·65536/100`.
    */
  def lottery(traceId: String, pct: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(traceId.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 4)
    java.lang.Long.parseLong(hex, 16) < pct * 65536L / 100
  }

  def decideFn(pct: Int, gapMs: Long)(
      traceId: String, spans: Iterator[SpanIn],
      state: GroupState[TraceState]): Iterator[Decision] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(Decision(traceId, st.nSpans, st.hasErr,
        st.hasErr || lottery(traceId, pct)))
    } else {
      var st = state.getOption.getOrElse(TraceState(0, false, Long.MinValue))
      spans.foreach { s =>
        st = TraceState(st.nSpans + 1, st.hasErr || s.is_err,
          math.max(st.lastMs, s.ts.getTime))
      }
      state.update(st)
      state.setTimeoutTimestamp(st.lastMs + gapMs)
      Iterator.empty
    }
  }

  /** Streaming arm: watermark bounds lateness, the gap timeout closes
    * traces, Append mode (a decision is immutable once emitted).
    */
  def sampleStream(spark: SparkSession, spans: Dataset[SpanIn],
                   pct: Int = 10, gapMinutes: Int = 10): Dataset[Decision] = {
    import spark.implicits._
    spans.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        decideFn(pct, gapMinutes * 60000L))
  }
}
