package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TemporalJoins

/** Time-series join queries over the `events` table: AS-OF (latest
  * quote at-or-before each trade) and RANGE (points within interval
  * windows) — the two joins a tick-data engine needs that the
  * DataFrame API lacks as primitives. Both derive integer-valued
  * streams from `events` so DuckDB (which has native ASOF / range
  * joins — the oracle) agrees hash-for-hash.
  */
object Temporal {

  /** Trades as-of joined to quotes on (asset, event_id order): every
    * 5th event is a trade, the rest are quotes; each trade picks up
    * the latest same-asset quote at-or-before it. One shuffle on
    * asset (union + running last), versus DuckDB's native ASOF JOIN.
    */
  private val joinAsof = Q(
    "q_join_asof",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_id", pmod($"user_id", lit(16)).as("asset"))
      val quotes = ev.filter($"event_id" % 5 =!= 0)
        .select($"asset", $"event_id".as("k"),
          $"event_id".as("quote_id"),
          pmod($"event_id" * 31, lit(1000)).as("quote_val"))
      val trades = ev.filter($"event_id" % 5 === 0)
        .select($"asset", $"event_id".as("k"),
          pmod($"event_id" * 7, lit(500)).as("trade_val"))
      TemporalJoins.asOfJoin(trades, quotes, keys = Seq("asset"), tsCol = "k")
        .orderBy($"asset", $"k")
    },
    Some("""WITH ev AS (SELECT event_id, user_id % 16 AS asset FROM events),
           |quotes AS (
           |  SELECT asset, event_id AS k, event_id AS quote_id,
           |         (event_id * 31) % 1000 AS quote_val
           |  FROM ev WHERE event_id % 5 <> 0
           |),
           |trades AS (
           |  SELECT asset, event_id AS k, (event_id * 7) % 500 AS trade_val
           |  FROM ev WHERE event_id % 5 = 0
           |)
           |SELECT t.asset, t.k, t.trade_val, q.quote_id, q.quote_val
           |FROM trades t ASOF JOIN quotes q
           |  ON t.asset = q.asset AND q.k <= t.k
           |ORDER BY t.asset, t.k""".stripMargin),
  )

  /** LEFT as-of: trades with NO prior same-asset quote survive with
    * null quote columns — the variant a feature-store lookup needs
    * (every entity row keeps its place; missing history is a null
    * feature, not a dropped row). Oracled against DuckDB's native
    * ASOF LEFT JOIN.
    */
  private val joinAsofLeft = Q(
    "q_join_asof_left",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_id", pmod($"user_id", lit(16)).as("asset"))
      // quotes restricted to LATE events only (event_id >= 5000), so
      // early trades genuinely have no prior quote and the null path
      // carries real rows at sf0.01
      val quotes = ev.filter($"event_id" % 5 =!= 0 && $"event_id" >= 5000)
        .select($"asset", $"event_id".as("k"),
          $"event_id".as("quote_id"),
          pmod($"event_id" * 31, lit(1000)).as("quote_val"))
      val trades = ev.filter($"event_id" % 5 === 0)
        .select($"asset", $"event_id".as("k"),
          pmod($"event_id" * 7, lit(500)).as("trade_val"))
      TemporalJoins.asOfJoin(trades, quotes, keys = Seq("asset"),
          tsCol = "k", how = "left")
        .orderBy($"asset", $"k")
    },
    Some("""WITH ev AS (SELECT event_id, user_id % 16 AS asset FROM events),
           |quotes AS (
           |  SELECT asset, event_id AS k, event_id AS quote_id,
           |         (event_id * 31) % 1000 AS quote_val
           |  FROM ev WHERE event_id % 5 <> 0 AND event_id >= 5000
           |),
           |trades AS (
           |  SELECT asset, event_id AS k, (event_id * 7) % 500 AS trade_val
           |  FROM ev WHERE event_id % 5 = 0
           |)
           |SELECT t.asset, t.k, t.trade_val, q.quote_id, q.quote_val
           |FROM trades t ASOF LEFT JOIN quotes q
           |  ON t.asset = q.asset AND q.k <= t.k
           |ORDER BY t.asset, t.k""".stripMargin),
  )

  /** FORWARD as-of: each trade picks up the EARLIEST same-asset quote
    * at-or-after it — the "next quote" lookup (slippage / fill
    * analysis reads the market just after the trade, the mirror of
    * the backward state lookup). Same single-shuffle union+window
    * machinery with the time order reversed
    * (`TemporalJoins.asOfJoin(direction = "forward")`); the oracle
    * states it as arg-min over the qualifying quotes.
    */
  private val joinAsofForward = Q(
    "q_join_asof_forward",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_id", pmod($"user_id", lit(16)).as("asset"))
      val quotes = ev.filter($"event_id" % 5 =!= 0)
        .select($"asset", $"event_id".as("k"),
          $"event_id".as("quote_id"),
          pmod($"event_id" * 31, lit(1000)).as("quote_val"))
      val trades = ev.filter($"event_id" % 5 === 0)
        .select($"asset", $"event_id".as("k"),
          pmod($"event_id" * 7, lit(500)).as("trade_val"))
      TemporalJoins.asOfJoin(trades, quotes, keys = Seq("asset"),
          tsCol = "k", direction = "forward")
        .orderBy($"asset", $"k")
    },
    Some("""WITH ev AS (SELECT event_id, user_id % 16 AS asset FROM events),
           |quotes AS (
           |  SELECT asset, event_id AS k, event_id AS quote_id,
           |         (event_id * 31) % 1000 AS quote_val
           |  FROM ev WHERE event_id % 5 <> 0
           |),
           |trades AS (
           |  SELECT asset, event_id AS k, (event_id * 7) % 500 AS trade_val
           |  FROM ev WHERE event_id % 5 = 0
           |)
           |SELECT t.asset, t.k, t.trade_val,
           |       min_by(q.quote_id, q.k) AS quote_id,
           |       min_by(q.quote_val, q.k) AS quote_val
           |FROM trades t JOIN quotes q
           |  ON q.asset = t.asset AND q.k >= t.k
           |GROUP BY t.asset, t.k, t.trade_val
           |ORDER BY t.asset, t.k""".stripMargin),
  )

  /** Interval × point range join: every 503rd event spawns a ±200
    * window; events inside a window aggregate into it. Spark side uses
    * the binned equi-join strategy (bin width 400 ≈ the span, so each
    * interval lands in ≤ 2 bins); the oracle states the plain
    * inequality join.
    */
  private val joinRange = Q(
    "q_join_range",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_id", pmod($"event_id" * 13, lit(100)).as("pv"))
      val intervals = ev.filter($"event_id" % 503 === 0)
        .select($"event_id".as("sess_id"),
          ($"event_id" - 200).as("lo"), ($"event_id" + 200).as("hi"))
      TemporalJoins
        .rangeJoinBinned(ev, "event_id", intervals, "lo", "hi", binWidth = 400L)
        .groupBy($"sess_id")
        .agg(
          count(lit(1)).as("n_events"),
          sum($"pv").as("sum_pv"),
          min($"event_id").as("first_event"),
          max($"event_id").as("last_event"),
        )
        .orderBy($"sess_id")
    },
    Some("""WITH ev AS (SELECT event_id, (event_id * 13) % 100 AS pv FROM events),
           |intervals AS (
           |  SELECT event_id AS sess_id, event_id - 200 AS lo, event_id + 200 AS hi
           |  FROM ev WHERE event_id % 503 = 0
           |)
           |SELECT i.sess_id,
           |       count(*) AS n_events,
           |       CAST(sum(e.pv) AS BIGINT) AS sum_pv,
           |       min(e.event_id) AS first_event,
           |       max(e.event_id) AS last_event
           |FROM intervals i JOIN ev e ON e.event_id BETWEEN i.lo AND i.hi
           |GROUP BY i.sess_id
           |ORDER BY i.sess_id""".stripMargin),
  )

  /** SCD2 interval building (`operators/Scd.scala`): each user's event
    * stream becomes effective-dated state versions — consecutive
    * same-type events collapse, a type change opens a new version,
    * the open (current) version has NULL valid_to. This is the
    * dimension table an as-of join then serves "state at time t"
    * lookups from. One exchange on user_id carries the lag, the
    * running version sum, the per-version agg, and the valid_to lead.
    */
  private val scd2Intervals = Q(
    "q_scd2_intervals",
    (s, dir) => {
      import s.implicits._
      graft.operators.Scd
        .intervals(Tables(s, dir).events,
          keyCol = "user_id", stateCol = "event_type",
          tsCol = "ts", ordCol = "event_id")
        .orderBy($"user_id", $"version")
    },
    Some("""WITH o AS (
           |  SELECT user_id, event_id, ts, event_type,
           |         CASE WHEN lag(event_type) OVER w IS NULL
           |                OR lag(event_type) OVER w <> event_type
           |              THEN 1 ELSE 0 END AS chg
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |),
           |v AS (
           |  SELECT user_id, event_type, ts, chg,
           |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                        ROWS UNBOUNDED PRECEDING) AS version
           |  FROM o
           |),
           |g AS (
           |  SELECT user_id, CAST(version AS BIGINT) AS version,
           |         min(event_type) AS state, min(ts) AS valid_from,
           |         count(*) AS n_obs
           |  FROM v GROUP BY user_id, version
           |)
           |SELECT user_id, version, state, valid_from,
           |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           |         AS valid_to,
           |       n_obs
           |FROM g
           |ORDER BY user_id, version""".stripMargin),
  )

  /** Time-decayed engagement score per user — the recency-weighted
    * feature every ranking/freshness pipeline computes (half-life
    * decay: an event k hours before the corpus max contributes
    * value·2⁻ᵏ). Exactness discipline: naive Σ value·2⁻ᵏ sums doubles
    * of wildly different magnitudes — order-DEPENDENT and so
    * unhashable across engines; instead each term is the exact
    * integer cents·2^(30−k) (k capped at 30, bounded ≤ ~1e13/term),
    * the per-user sum is order-free integer math, and ONE final
    * division by 2³⁰ produces the score. One map-side-combinable
    * aggregation + a 1-row max broadcast: linear at any scale.
    */
  private val eventsDecayedScore = Q(
    "q_events_decayed_score",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      val mx = ev.agg(max($"ts").as("m"))
      ev.crossJoin(broadcast(mx))
        .select($"user_id",
          round($"value" * 100).cast("long").as("cents"),
          // integer MILLIS on both sides: unix_timestamp truncates
          // sub-second parts while DuckDB's epoch() keeps them, which
          // shifts hour-boundary rows into a different decay bucket
          expr("CAST(least((unix_millis(m) - unix_millis(ts)) div 3600000, " +
            "CAST(30 AS BIGINT)) AS INT)").as("age_h"))
        .select($"user_id",
          expr("cents * shiftleft(CAST(1 AS BIGINT), 30 - age_h)").as("term"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum($"term").as("scaled"))
        .select($"user_id", $"n_events",
          round($"scaled".cast("double") / 1073741824.0, 4).as("decayed_score"))
        .orderBy($"user_id")
    },
    Some("""WITH mx AS (SELECT max(ts) AS m FROM events),
           |k AS (
           |  SELECT user_id,
           |         CAST(round(value * 100) AS BIGINT) AS cents,
           |         least(CAST((epoch_ms(m) - epoch_ms(ts)) // 3600000 AS BIGINT), 30) AS age_h
           |  FROM events, mx
           |)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           |       round(CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(30 - age_h AS INT)))
           |                  AS DOUBLE) / 1073741824.0, 4) AS decayed_score
           |FROM k GROUP BY user_id
           |ORDER BY user_id""".stripMargin),
  )

  /** Interval × interval overlap join (campaign windows × incident
    * windows): every 101st event spawns a ±150 "campaign", every 173rd
    * a ±100 "incident"; overlapping pairs report their overlap length.
    * Spark side uses the binned equi-join (`binWidth` 256 ≈ the spans,
    * each interval touching ≤ 3 bins, emit-once in the first shared
    * bin — see `TemporalJoins.intervalOverlapJoinBinned`); the oracle
    * states the plain two-sided inequality join.
    */
  private val joinIntervalOverlap = Q(
    "q_join_interval_overlap",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events.select($"event_id")
      val a = ev.filter($"event_id" % 101 === 0)
        .select($"event_id".as("a_id"),
          ($"event_id" - 150).as("a_lo"), ($"event_id" + 150).as("a_hi"))
      val b = ev.filter($"event_id" % 173 === 0)
        .select($"event_id".as("b_id"),
          ($"event_id" - 100).as("b_lo"), ($"event_id" + 100).as("b_hi"))
      TemporalJoins
        .intervalOverlapJoinBinned(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 256L)
        .select($"a_id", $"b_id",
          (least($"a_hi", $"b_hi") - greatest($"a_lo", $"b_lo")).as("overlap_len"))
        .orderBy($"a_id", $"b_id")
    },
    Some("""WITH a AS (
           |  SELECT event_id AS a_id, event_id - 150 AS a_lo, event_id + 150 AS a_hi
           |  FROM events WHERE event_id % 101 = 0
           |),
           |b AS (
           |  SELECT event_id AS b_id, event_id - 100 AS b_lo, event_id + 100 AS b_hi
           |  FROM events WHERE event_id % 173 = 0
           |)
           |SELECT a_id, b_id,
           |       least(a_hi, b_hi) - greatest(a_lo, b_lo) AS overlap_len
           |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
           |ORDER BY a_id, b_id""".stripMargin),
  )

  /** NEAREST as-of: each trade takes whichever same-asset quote is
    * closer in key distance — backward on ties (the pandas
    * `merge_asof(direction='nearest')` rule) — composed from the
    * backward and forward primitives (two left as-ofs, one equi-join
    * on the unique trade key, a per-row CASE; the right side's own
    * key rides along as `quote_id`, so distance needs no extra
    * payload). Trades with no quote on either side survive with null
    * quote columns. Reported `dist` makes the tie-break auditable.
    */
  private val joinAsofNearest = Q(
    "q_join_asof_nearest",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_id", pmod($"user_id", lit(16)).as("asset"))
      val quotes = ev.filter($"event_id" % 5 =!= 0)
        .select($"asset", $"event_id".as("k"),
          $"event_id".as("quote_id"),
          pmod($"event_id" * 31, lit(1000)).as("quote_val"))
      val trades = ev.filter($"event_id" % 5 === 0)
        .select($"asset", $"event_id".as("k"),
          pmod($"event_id" * 7, lit(500)).as("trade_val"))
      val b = TemporalJoins.asOfJoin(trades, quotes, keys = Seq("asset"),
          tsCol = "k", how = "left")
        .withColumnRenamed("quote_id", "b_id")
        .withColumnRenamed("quote_val", "b_val")
      val f = TemporalJoins.asOfJoin(trades, quotes, keys = Seq("asset"),
          tsCol = "k", how = "left", direction = "forward")
        .select($"asset", $"k",
          $"quote_id".as("f_id"), $"quote_val".as("f_val"))
      val takeBack = $"f_id".isNull ||
        ($"b_id".isNotNull && ($"k" - $"b_id") <= ($"f_id" - $"k"))
      b.join(f, Seq("asset", "k"))
        .select($"asset", $"k", $"trade_val",
          when(takeBack, $"b_id").otherwise($"f_id").as("quote_id"),
          when(takeBack, $"b_val").otherwise($"f_val").as("quote_val"),
          when(takeBack, $"k" - $"b_id").otherwise($"f_id" - $"k").as("dist"))
        .orderBy($"asset", $"k")
    },
    Some("""WITH ev AS (SELECT event_id, user_id % 16 AS asset FROM events),
           |quotes AS (
           |  SELECT asset, event_id AS k, event_id AS quote_id,
           |         (event_id * 31) % 1000 AS quote_val
           |  FROM ev WHERE event_id % 5 <> 0
           |),
           |trades AS (
           |  SELECT asset, event_id AS k, (event_id * 7) % 500 AS trade_val
           |  FROM ev WHERE event_id % 5 = 0
           |),
           |b AS (
           |  SELECT t.asset, t.k, t.trade_val,
           |         max_by(q.quote_id, q.k) AS b_id,
           |         max_by(q.quote_val, q.k) AS b_val
           |  FROM trades t LEFT JOIN quotes q
           |    ON q.asset = t.asset AND q.k <= t.k
           |  GROUP BY t.asset, t.k, t.trade_val
           |),
           |f AS (
           |  SELECT t.asset, t.k,
           |         min_by(q.quote_id, q.k) AS f_id,
           |         min_by(q.quote_val, q.k) AS f_val
           |  FROM trades t LEFT JOIN quotes q
           |    ON q.asset = t.asset AND q.k >= t.k
           |  GROUP BY t.asset, t.k
           |)
           |SELECT b.asset, b.k, b.trade_val,
           |       CASE WHEN f.f_id IS NULL OR (b.b_id IS NOT NULL
           |                  AND (b.k - b.b_id) <= (f.f_id - b.k))
           |            THEN b.b_id ELSE f.f_id END AS quote_id,
           |       CASE WHEN f.f_id IS NULL OR (b.b_id IS NOT NULL
           |                  AND (b.k - b.b_id) <= (f.f_id - b.k))
           |            THEN b.b_val ELSE f.f_val END AS quote_val,
           |       CASE WHEN f.f_id IS NULL OR (b.b_id IS NOT NULL
           |                  AND (b.k - b.b_id) <= (f.f_id - b.k))
           |            THEN b.k - b.b_id ELSE f.f_id - b.k END AS dist
           |FROM b JOIN f ON f.asset = b.asset AND f.k = b.k
           |ORDER BY b.asset, b.k""".stripMargin),
  )

  /** As-of with tolerance (pandas `merge_asof(tolerance=...)`, kdb
    * `wj` windows): a backward match older than the staleness bound is
    * DISCARDED, not used — the guard every live pricing join needs so
    * a halted instrument's last quote doesn't price today's trade.
    * Composed as backward as-of + a null-out projection on key
    * distance: correct because any quote older than the nearest-behind
    * one is farther, so "nearest-behind within tolerance" ≡
    * "nearest-behind, nulled if stale" — no second join, no range
    * scan. The oracle instead puts the tolerance INSIDE its join
    * predicate (`q.k BETWEEN t.k - 24 AND t.k`) — independent
    * formulation, same hash.
    */
  private val joinAsofTolerance = Q(
    "q_join_asof_tolerance",
    (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_id", pmod($"user_id", lit(16)).as("asset"))
      val quotes = ev.filter($"event_id" % 5 =!= 0)
        .select($"asset", $"event_id".as("k"),
          $"event_id".as("quote_id"),
          pmod($"event_id" * 31, lit(1000)).as("quote_val"))
      val trades = ev.filter($"event_id" % 5 === 0)
        .select($"asset", $"event_id".as("k"),
          pmod($"event_id" * 7, lit(500)).as("trade_val"))
      val fresh = $"quote_id".isNotNull && ($"k" - $"quote_id") <= 24
      TemporalJoins.asOfJoin(trades, quotes, keys = Seq("asset"),
          tsCol = "k", how = "left")
        .select($"asset", $"k", $"trade_val",
          when(fresh, $"quote_id").as("quote_id"),
          when(fresh, $"quote_val").as("quote_val"))
        .orderBy($"asset", $"k")
    },
    Some("""WITH ev AS (SELECT event_id, user_id % 16 AS asset FROM events),
           |quotes AS (
           |  SELECT asset, event_id AS k, event_id AS quote_id,
           |         (event_id * 31) % 1000 AS quote_val
           |  FROM ev WHERE event_id % 5 <> 0
           |),
           |trades AS (
           |  SELECT asset, event_id AS k, (event_id * 7) % 500 AS trade_val
           |  FROM ev WHERE event_id % 5 = 0
           |)
           |SELECT t.asset, t.k, t.trade_val,
           |       max_by(q.quote_id, q.k) AS quote_id,
           |       max_by(q.quote_val, q.k) AS quote_val
           |FROM trades t LEFT JOIN quotes q
           |  ON q.asset = t.asset AND q.k BETWEEN t.k - 24 AND t.k
           |GROUP BY t.asset, t.k, t.trade_val
           |ORDER BY t.asset, t.k""".stripMargin),
  )

  /** Point-in-time (PIT) dimension join — the lookup SCD2 exists for:
    * each fact row picks up the dimension version that was valid AT its
    * own timestamp. Dim = SCD2 intervals built from every 3rd event's
    * state stream; facts = the rest. The join is the backward as-of
    * primitive on (user, ts) — correct because SCD2 intervals are
    * contiguous half-open [valid_from, next valid_from), so "latest
    * version starting at-or-before ts" IS the valid-at-ts version, and
    * no valid_to predicate (or range join) is needed. Versions sharing
    * a valid_from are zero-length and invisible under half-open
    * semantics; they are dropped pre-join so the as-of tie-break is
    * deterministic. The oracle cross-checks with the explicit interval
    * predicate instead — two independent formulations, one hash.
    */
  private val joinPointInTime = Q(
    "q_join_point_in_time",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir).events
      val dim0 = graft.operators.Scd.intervals(
        ev.filter($"event_id" % 3 === 0),
        keyCol = "user_id", stateCol = "event_type",
        tsCol = "ts", ordCol = "event_id")
      val dim = dim0
        .withColumn("__rn", row_number().over(
          Window.partitionBy($"user_id", $"valid_from")
            .orderBy($"version".desc)))
        .filter($"__rn" === 1)
        .select($"user_id", $"valid_from".as("ts"), $"version", $"state")
      val facts = ev.filter($"event_id" % 3 =!= 0)
        .select($"user_id", $"ts", $"event_id",
          $"event_type".as("action"))
      TemporalJoins.asOfJoin(facts, dim, keys = Seq("user_id"),
          tsCol = "ts", how = "left")
        .select($"user_id", $"event_id", $"action", $"state", $"version")
        .orderBy($"user_id", $"event_id")
    },
    Some("""WITH o AS (
           |  SELECT user_id, event_id, ts, event_type,
           |         CASE WHEN lag(event_type) OVER w IS NULL
           |                OR lag(event_type) OVER w <> event_type
           |              THEN 1 ELSE 0 END AS chg
           |  FROM events WHERE event_id % 3 = 0
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |),
           |v AS (
           |  SELECT user_id, event_type, ts,
           |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |                        ROWS UNBOUNDED PRECEDING) AS version
           |  FROM o
           |),
           |g AS (
           |  SELECT user_id, CAST(version AS BIGINT) AS version,
           |         min(event_type) AS state, min(ts) AS valid_from
           |  FROM v GROUP BY user_id, version
           |),
           |iv AS (
           |  SELECT user_id, version, state, valid_from,
           |         lead(valid_from) OVER (PARTITION BY user_id
           |                                ORDER BY version) AS valid_to
           |  FROM g
           |),
           |dim AS (
           |  SELECT * FROM iv
           |  QUALIFY row_number() OVER (PARTITION BY user_id, valid_from
           |                             ORDER BY version DESC) = 1
           |),
           |facts AS (
           |  SELECT user_id, ts, event_id, event_type AS action
           |  FROM events WHERE event_id % 3 <> 0
           |)
           |SELECT f.user_id, f.event_id, f.action, d.state, d.version
           |FROM facts f LEFT JOIN dim d
           |  ON d.user_id = f.user_id AND d.valid_from <= f.ts
           | AND (d.valid_to IS NULL OR f.ts < d.valid_to)
           |ORDER BY f.user_id, f.event_id""".stripMargin),
  )

  val all: Seq[Q] =
    Seq(joinAsof, joinAsofForward, joinAsofLeft, joinRange, scd2Intervals,
      eventsDecayedScore, joinIntervalOverlap, joinAsofNearest,
      joinAsofTolerance, joinPointInTime)
}
