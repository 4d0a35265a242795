package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One observed value for the streaming gap-fill: the series key, the
  * observation's minute bucket (epoch millis), and the (event_id,
  * value) pair whose max-event_id member defines the minute's "last".
  */
final case class GapObs(series: String, minuteMs: Long, eventId: Long, value: Double)

/** One emitted spine row (matches the batch q_window_gap_fill shape:
  * formatted minute, series, carried value, gap marker).
  */
final case class GapRow(
    minute: String,
    event_type: String,
    filled_value: Option[Double],
    is_gap: Long,
)

/** Streaming forward-fill over a fixed minute spine — the
  * `transformWithState` counterpart of the batch gap-fill
  * (`q_window_gap_fill`, pandas `resample().last().ffill()` parity):
  * per series, every spine minute gets a row, value-less minutes carry
  * the most recent observation, `is_gap` marks carries vs observations.
  *
  * Mechanics: keyed by series, each key accumulates its per-minute
  * last observation in a `MapState[minuteMs, (eventId, value)]` —
  * max-event_id wins within a minute, the same `max_by(value,
  * event_id)` tie-break the batch agg uses, commutative across
  * micro-batches so arrival slicing can't change the answer. The first
  * input row arms an EVENT-TIME TIMER at the spine's high bound; when
  * the terminal watermark passes it, the key walks lo..hi once,
  * emitting the carry-forward rows. Emission is thus all-at-once per
  * key at spine close — the right contract for a bounded replay window
  * (a live deployment would arm one timer per spine segment instead;
  * the state machine is identical).
  *
  * Scale: state per key = the key's observed minutes (bounded by the
  * spine length), keys partition the shuffle exactly like the batch
  * window's partitionBy, and no key ever sees another key's state —
  * parallelism = #series, the same bound as the batch form. Spine
  * bounds are driver-side Longs compiled into the processor, matching
  * the batch plan's 1-row bounds aggregate.
  *
  * The spine is CLOSED-ended ([loMs, hiMs] inclusive, 60 000 ms step)
  * — identical to `sequence(min_minute, max_minute, 1 min)` batch-side.
  */
class GapFillProcessor(loMs: Long, hiMs: Long)
    extends StatefulProcessor[String, GapObs, GapRow] {

  @transient private var obs: MapState[Long, (Long, Double)] = _
  @transient private var armed: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    obs = getHandle.getMapState[Long, (Long, Double)](
      "obs", Encoders.scalaLong, Encoders.product[(Long, Double)], TTLConfig.NONE)
    armed = getHandle.getValueState[Boolean](
      "armed", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[GapObs],
      timerValues: TimerValues): Iterator[GapRow] = {
    rows.foreach { r =>
      val keep =
        !obs.containsKey(r.minuteMs) || obs.getValue(r.minuteMs)._1 < r.eventId
      if (keep) obs.updateValue(r.minuteMs, (r.eventId, r.value))
    }
    if (!armed.exists()) {
      // hiMs - 1: expiry is strict (< watermark), and the terminal
      // watermark can land exactly ON the minute boundary when the last
      // event does — one ms early keeps the timer inside it either way
      getHandle.registerTimer(hiMs - 1)
      armed.update(true)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[GapRow] = {
    val seen: Map[Long, (Long, Double)] = obs.iterator().map { case (k, v) => k -> v }.toMap
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    var carry: Option[Double] = None
    (loMs to hiMs by 60000L).iterator.map { t =>
      val o = seen.get(t)
      if (o.isDefined) carry = Some(o.get._2)
      GapRow(
        fmt.format(java.time.Instant.ofEpochMilli(t)),
        key,
        carry,
        if (o.isDefined) 0L else 1L)
    }
  }
}

object GapFill {

  /** Build the streaming gap-fill over an event stream: `ev` must have
    * (event_type, ts TIMESTAMP, event_id, value); output is the filled
    * spine in append mode once the watermark passes `hiMs`.
    */
  def filledSpine(ev: DataFrame, loMs: Long, hiMs: Long): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev
      .select(
        $"event_type".as("series"),
        expr("(cast(ts as bigint) div 60) * 60000").as("minuteMs"),
        $"event_id".as("eventId"),
        $"value",
        $"ts") // kept: the event-time column must reach the operator
      .withWatermark("ts", "0 seconds")
      .as[GapObs]
      .groupByKey(_.series)
      .transformWithState(
        new GapFillProcessor(loMs, hiMs), TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
