package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Order-statistic / rank-analytic / recursive-SQL surface: exact
  * interpolated median, deterministic mode, the full rank-function
  * family, and Spark 4's `WITH RECURSIVE` (UnionLoopExec) — the
  * SQL-facing analytics a reference user reaches for after the
  * summary-statistics queries (reference `notebooks/bbo.ipynb`
  * descriptive cells; `collector/src/main.rs:132-135` scalar surface).
  */
object Analytic {

  /** Exact interpolated median (percentile 0.5 over integer cents —
    * the midpoint of two longs is exactly representable, so the
    * interpolation is bit-stable across engines) plus a DETERMINISTIC
    * mode per order priority. Mode ties are real (statuses have near-
    * uniform counts), so the pick is pinned by (count DESC, status
    * ASC) — both engines compute the same row_number over the same
    * total order rather than trusting an engine's arbitrary tie
    * choice. Two map-side-combinable aggregations over orders plus a
    * 5-row join: one exchange each at any scale.
    */
  private val aggMedianMode = Q(
    "q_agg_median_mode",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir).orders
        .select($"o_orderpriority".as("priority"), $"o_orderstatus".as("status"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val med = orders.groupBy($"priority")
        .agg(
          round(expr("percentile(cents, 0.5)") / 100.0, 2).as("median_price"),
          count(lit(1)).as("n"))
      val w = Window.partitionBy($"priority").orderBy($"c".desc, $"status")
      val mode = orders.groupBy($"priority", $"status").agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"priority", $"status".as("mode_status"))
      med.join(mode, "priority")
        .select($"priority", $"median_price", $"mode_status", $"n")
        .orderBy($"priority")
    },
    Some("""WITH c AS (
           |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
           |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders
           |),
           |med AS (
           |  SELECT priority,
           |         round(quantile_cont(cents, 0.5) / 100.0, 2) AS median_price,
           |         count(*) AS n
           |  FROM c GROUP BY priority
           |),
           |cnt AS (SELECT priority, status, count(*) AS cc FROM c GROUP BY 1, 2),
           |md AS (
           |  SELECT priority, status AS mode_status
           |  FROM (SELECT priority, status,
           |               row_number() OVER (PARTITION BY priority
           |                                  ORDER BY cc DESC, status) AS rn
           |        FROM cnt)
           |  WHERE rn = 1
           |)
           |SELECT m.priority, m.median_price, d.mode_status, m.n
           |FROM med m JOIN md d USING (priority)
           |ORDER BY priority""".stripMargin),
  )

  /** The rank-function family — dense_rank / percent_rank / cume_dist
    * — over lineitem quantities per return flag. Quantities are
    * heavily tied (50 distinct values across ~200k rows per flag), so
    * the ranks are computed over the FULL partition and then collapsed
    * to one row per (flag, qty): tied rows carry identical rank
    * values by definition, which is what makes the collapsed output
    * deterministic. One exchange+sort; the distinct rides the same
    * partitioning.
    */
  private val windowRankDense = Q(
    "q_window_rank_dense",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"flag").orderBy($"qty")
      Tables(s, dir).lineitem
        .select($"l_returnflag".as("flag"), $"l_quantity".cast("long").as("qty"))
        .select($"flag", $"qty",
          dense_rank().over(w).as("dr"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"))
        .distinct()
        .orderBy($"flag", $"qty")
    },
    Some("""SELECT DISTINCT l_returnflag AS flag,
           |       CAST(l_quantity AS BIGINT) AS qty,
           |       dense_rank() OVER w AS dr,
           |       round(percent_rank() OVER w, 4) AS pr,
           |       round(cume_dist() OVER w, 4) AS cd
           |FROM lineitem
           |WINDOW w AS (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT))
           |ORDER BY flag, qty""".stripMargin),
  )

  /** Spark 4 recursive CTE (`WITH RECURSIVE` → UnionLoop /
    * UnionLoopExec): ancestor chains over the synthetic binary-heap
    * forest `parent(id) = id div 2` on part keys — each part's full
    * ancestor set materialized by the recursion, then folded to
    * (depth, path_sum). Recursion depth is ⌈log₂ maxId⌉ (~11 at
    * sf0.01), and each iteration is one narrow projection over the
    * previous frontier, so the loop is log-bounded at any scale —
    * the declarative twin of `Hierarchy.flattenForest`'s pointer
    * doubling (which needs only ⌈log₂ depth⌉ JOINS but hand-manages
    * state; the CTE form is what a SQL user writes). DuckDB runs the
    * identical recursion as the oracle.
    */
  private val sqlRecursiveCte = Q(
    "q_sql_recursive_cte",
    (s, dir) => {
      Tables(s, dir).part.createOrReplaceTempView("part_rcte_v")
      s.sql("""
        WITH RECURSIVE anc AS (
          SELECT p_partkey AS id, p_partkey AS a FROM part_rcte_v
          UNION ALL
          SELECT id, a div 2 AS a FROM anc WHERE a > 1
        )
        SELECT id, CAST(count(*) - 1 AS BIGINT) AS depth,
               CAST(sum(a) AS BIGINT) AS path_sum
        FROM anc
        GROUP BY id
        ORDER BY id
      """)
    },
    Some("""WITH RECURSIVE anc AS (
           |  SELECT p_partkey AS id, p_partkey AS a FROM part
           |  UNION ALL
           |  SELECT id, a // 2 AS a FROM anc WHERE a > 1
           |)
           |SELECT id, CAST(count(*) - 1 AS BIGINT) AS depth,
           |       CAST(sum(a) AS BIGINT) AS path_sum
           |FROM anc
           |GROUP BY id
           |ORDER BY id""".stripMargin),
  )

  /** Correlation / covariance / stddev per group via EXACT integer
    * moments: the five sums (Σx, Σy, Σxy, Σx², Σy²) are accumulated as
    * BIGINTs over integer-quantized inputs (quantity as-is, price
    * rounded to whole dollars — Σy² then stays under 2⁶³ through sf1's
    * 6M rows), and the statistics are derived from the closed-form
    * moment identities in ONE identical double expression on both
    * engines. That is what makes a float statistic hash-stable: the
    * usual streaming corr/covar aggregates accumulate doubles in
    * engine- and partition-order-dependent ways, while exact integer
    * moments are commutative (any partitioning, any merge order — the
    * same property the sketch family builds on) and the final formula
    * is one deterministic IEEE evaluation. Map-side combinable, one
    * exchange of 5 longs per group.
    */
  private val aggCorrMoments = Q(
    "q_agg_corr_moments",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .select($"l_returnflag".as("flag"),
          $"l_quantity".cast("long").as("x"),
          round($"l_extendedprice").cast("long").as("y"))
        .groupBy($"flag")
        .agg(
          count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"),
          sum($"x" * $"x").as("sxx"),
          sum($"y" * $"y").as("syy"))
        .select($"flag", $"n",
          expr("round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
            "(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * " +
            "sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)")
            .as("corr_qty_price"),
          expr("round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1), 4)")
            .as("covar_qty_price"),
          expr("round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)), 4)")
            .as("stddev_qty"))
        .orderBy($"flag")
    },
    Some("""WITH q AS (
           |  SELECT l_returnflag AS flag,
           |         CAST(l_quantity AS BIGINT) AS x,
           |         CAST(round(l_extendedprice) AS BIGINT) AS y
           |  FROM lineitem
           |),
           |m AS (
           |  SELECT flag, count(*) AS n,
           |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |         CAST(sum(x * y) AS BIGINT) AS sxy,
           |         CAST(sum(x * x) AS BIGINT) AS sxx,
           |         CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM q GROUP BY flag
           |)
           |SELECT flag, n,
           |       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
           |             (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
           |              sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 4)
           |         AS corr_qty_price,
           |       round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1), 4)
           |         AS covar_qty_price,
           |       round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)), 4)
           |         AS stddev_qty
           |FROM m
           |ORDER BY flag""".stripMargin),
  )

  /** Value-positional window frames — first_value / nth_value over the
    * running frame, last_value over a bounded FORWARD frame — the
    * frame semantics q_window_moving_avg's row-frame average doesn't
    * touch (forward frames and the nth_value null-until-filled
    * behavior at the partition head are both under the hash). Integer
    * cents, unique (event_id) order key → total order, no ties. One
    * exchange+sort shared by all three windows.
    */
  private val windowFrameValues = Q(
    "q_window_frame_values",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"event_id")
      Tables(s, dir).events
        .select($"event_id", $"event_type",
          round($"value" * 100).cast("long").as("cents"))
        .select($"event_id", $"event_type",
          first($"cents").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_cents"),
          nth_value($"cents", 3).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("nth3_cents"),
          last($"cents").over(w.rowsBetween(Window.currentRow, 2))
            .as("fwd2_cents"))
        .orderBy($"event_id")
    },
    Some("""WITH c AS (
           |  SELECT event_id, event_type,
           |         CAST(round(value * 100) AS BIGINT) AS cents
           |  FROM events
           |)
           |SELECT event_id, event_type,
           |       first_value(cents) OVER (PARTITION BY event_type ORDER BY event_id
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_cents,
           |       nth_value(cents, 3) OVER (PARTITION BY event_type ORDER BY event_id
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth3_cents,
           |       last_value(cents) OVER (PARTITION BY event_type ORDER BY event_id
           |         ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS fwd2_cents
           |FROM c
           |ORDER BY event_id""".stripMargin),
  )

  /** Wide→long UNPIVOT (melt) of the lineitem measure columns through
    * Spark's native `Dataset.unpivot` (ExpandExec — a narrow per-row
    * fan-out, never a shuffle), then one map-side-combinable
    * aggregation per measure. This is the schema-normalization step a
    * metrics lake runs before generic per-measure profiling: 4 wide
    * columns become (measure, value) rows so ONE downstream pipeline
    * handles any measure count. Exactness: values are quantized to
    * integer cents BEFORE the sum (the house float discipline), and
    * the mean divides the two exact integers identically in both
    * engines. Oracle is the portable UNION ALL formulation of the same
    * melt.
    */
  private val aggUnpivot = Q(
    "q_agg_unpivot",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_discount", $"l_tax")
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
          "measure", "value")
        .groupBy($"measure")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("long")).as("cents"))
        .select($"measure", $"n",
          round($"cents" / 100.0, 2).as("total"),
          round($"cents" / 100.0 / $"n", 4).as("mean"))
        .orderBy($"measure")
    },
    Some("""WITH m AS (
           |  SELECT 'l_quantity' AS measure,
           |         CAST(round(l_quantity * 100) AS BIGINT) AS c FROM lineitem
           |  UNION ALL SELECT 'l_extendedprice',
           |         CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
           |  UNION ALL SELECT 'l_discount',
           |         CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
           |  UNION ALL SELECT 'l_tax',
           |         CAST(round(l_tax * 100) AS BIGINT) FROM lineitem
           |)
           |SELECT measure, CAST(count(*) AS BIGINT) AS n,
           |       round(CAST(sum(c) AS BIGINT) / 100.0, 2) AS total,
           |       round(CAST(sum(c) AS BIGINT) / 100.0 / count(*), 4) AS mean
           |FROM m GROUP BY measure
           |ORDER BY measure""".stripMargin),
  )

  val all: Seq[Q] = Seq(aggMedianMode, windowRankDense, sqlRecursiveCte,
    aggCorrMoments, windowFrameValues, aggUnpivot)
}
