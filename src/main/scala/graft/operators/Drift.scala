package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitor between two corpus snapshots — the
  * data-quality alarm a continuously-ingesting pipeline runs next to
  * the [[Profile]] report: per group, how far has a value's histogram
  * moved since the last snapshot?
  *
  * The distance is the L1 gap between the two per-mille histograms
  * (2× total-variation distance), computed ENTIRELY in integers:
  * bins by integral division (`least(v div binWidth, nBins−1)`,
  * overflow clamped to the top bin), shares as `(count · 1000) div
  * n_group` — both engines truncate identically, so the metric is
  * hash-comparable with no transcendentals (the reason this is L1 and
  * not a KL/PSI, whose `ln` would drag libm in; rank-ordering of
  * drifting groups is what the alarm consumes, and L1 preserves it).
  *
  * Scale shape: one (group, bin) aggregation per snapshot — hash
  * partial aggregation collapses rows map-side, the exchange carries
  * (groups × bins) rows; the histogram join is keyed on the same
  * (group, bin); per-group totals are tiny broadcasts. Linear in both
  * snapshots, no corpus-width shuffle.
  */
object Drift {

  /** The binned (group, bin, count) histogram the L1 compare consumes:
    * one hash aggregation, count column named `cntCol`. Every
    * aggregate is MERGEABLE, so this is also the state a streaming
    * complete-mode monitor holds — fixed at groups × bins rows however
    * many micro-batches arrive (see q_stream_drift).
    */
  def histogram(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      binWidth: Long,
      nBins: Int,
      cntCol: String,
  ): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1 (got $binWidth)")
    require(nBins >= 2, s"nBins must be >= 2 (got $nBins)")
    df.select(col(groupCol).as("g"),
        expr(s"least(cast(`$valueCol` as bigint) div $binWidth, ${nBins - 1})").as("bin"))
      .groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as(cntCol))
  }

  /** The L1 compare over two pre-binned histograms `(g, bin, c_old)` /
    * `(g, bin, c_new)` — per-group totals are the bin sums (every row
    * lands in exactly one bin), so no second pass over the raw
    * snapshots is needed. Output: (g, n_old, n_new, l1_pm).
    */
  def histogramL1FromHists(histOld: DataFrame, histNew: DataFrame): DataFrame = {
    val spark = histOld.sparkSession
    import spark.implicits._
    def totals(h: DataFrame, c: String, n: String) =
      h.groupBy($"g").agg(sum(col(c)).as(n))
    histOld
      .join(histNew, Seq("g", "bin"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .join(broadcast(totals(histOld, "c_old", "n_old")), Seq("g"), "left")
      .join(broadcast(totals(histNew, "c_new", "n_new")), Seq("g"), "left")
      .na.fill(0L, Seq("n_old", "n_new"))
      .withColumn("s_old",
        when($"n_old" > 0, expr("(c_old * 1000) div n_old")).otherwise(0L))
      .withColumn("s_new",
        when($"n_new" > 0, expr("(c_new * 1000) div n_new")).otherwise(0L))
      .groupBy($"g")
      .agg(
        max($"n_old").as("n_old"),
        max($"n_new").as("n_new"),
        sum(abs($"s_old" - $"s_new")).as("l1_pm"))
  }

  /** Per-group L1 drift (per-mille) of `valueCol`'s histogram between
    * `oldDf` and `newDf`. Output: (group, n_old, n_new, l1_pm).
    * Groups absent from one snapshot compare against an empty
    * histogram (shares 0) — a group appearing or vanishing IS maximal
    * drift, not an error.
    */
  def histogramL1(
      oldDf: DataFrame,
      newDf: DataFrame,
      groupCol: String,
      valueCol: String,
      binWidth: Long,
      nBins: Int,
  ): DataFrame =
    histogramL1FromHists(
      histogram(oldDf, groupCol, valueCol, binWidth, nBins, "c_old"),
      histogram(newDf, groupCol, valueCol, binWidth, nBins, "c_new"))
      .withColumnRenamed("g", groupCol)

  /** Per-group χ² divergence of the unigram token distribution against
    * the whole-corpus mix — the data-mixing diagnostic a training team
    * reads before weighting sources (a source whose token distribution
    * sits far from the mix is the one reweighting actually moves; cf.
    * the importance-resampling family, q_text_dsir). χ²(p‖q) =
    * Σ_w (p_w − q_w)²/q_w keeps the whole computation RATIONAL — the
    * same no-libm discipline as [[histogramL1]] (KL/JS would drag `ln`
    * in), and χ² upper-bounds both, so the per-source ranking the
    * alarm consumes is preserved.
    *
    * Determinism: probabilities are floor-quantized to ppb FIRST
    * (`p_q = 10⁹·n_sw div N_s`, `q_q = max(10⁹·m_w div M, 1)` — the
    * max(·,1) guards a sub-ppb global word, which m_w ≥ minCount
    * makes rare), then each word's term `(p_q − q_q)² div q_q` is an
    * exact long (|p_q − q_q| ≤ 10⁹ → square ≤ 10¹⁸), summed exactly;
    * χ² = Σ/10⁹ is the single terminal division. Everything both
    * engines floor identically — no double accumulates.
    *
    * Scale shape: one corpus-sized (group, word) hash aggregation
    * (map-side combined); the global word counts are a second
    * aggregation OVER THAT TABLE (≤ |groups|·|vocab| rows, not corpus
    * rows). The χ² itself runs on the full group × kept-vocab DOMAIN
    * (a group that never uses a word still owes its q_w mass) — that
    * cross is |groups|·|keptVocab| rows, which `minCount` is the lever
    * to bound: at 100 TB prune the rare tail aggressively (the tail's
    * per-word q_w contribution is what the quantization floors to
    * zero anyway) and the domain join, not the corpus, is what
    * shuffles. Group totals and the corpus total ride broadcasts.
    */
  /** The (group, word, count) unigram table the χ² compare consumes:
    * one corpus-sized hash aggregation, map-side combined. Every
    * aggregate is MERGEABLE, so this is also the state a streaming
    * complete-mode mixing monitor holds — ≤ |groups|·|vocab| rows
    * however many micro-batches arrive (see q_stream_chi2_divergence).
    */
  def tokenCounts(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol).as("g"), explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("nsw"))

  def chi2Tokens(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      minCount: Long = 2L,
  ): DataFrame =
    chi2FromCounts(tokenCounts(df, groupCol, textCol), minCount)
      .withColumnRenamed("g", groupCol)

  /** The χ² tail over a pre-aggregated `(g, w, nsw)` unigram table —
    * everything below the corpus-sized scan in [[chi2Tokens]]'s shape,
    * so a streaming monitor can feed its complete-mode state table
    * straight in. Output keyed `g`.
    */
  def chi2FromCounts(sw: DataFrame, minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    val spark = sw.sparkSession
    import spark.implicits._
    def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val wTot = sw.groupBy($"w").agg(sum($"nsw").as("mw"))
      .filter($"mw" >= minCount)
    // kept-vocab support only, on BOTH sides: p and q must normalize
    // over the same domain or a heavy rare-word tail reads as drift
    val kept = sw.join(wTot.select($"w"), Seq("w"))
    val gTot = kept.groupBy($"g").agg(sum($"nsw").as("ns"))
    val mTot = wTot.agg(sum($"mw").cast("decimal(38,0)").as("m"))
    // full group × kept-vocab domain: a word a group never uses still
    // contributes q_w to that group's divergence (p_w = 0). The group
    // side is |groups| rows — broadcast it, the vocab side streams.
    val domain = wTot.crossJoin(broadcast(gTot))
    val terms = domain
      .join(kept, Seq("g", "w"), "left")
      .na.fill(0L, Seq("nsw"))
      .crossJoin(broadcast(mTot))
      .select($"g", $"ns",
        fdiv(lit(1000000000L) * $"nsw".cast("decimal(38,0)"),
          $"ns".cast("decimal(38,0)")).as("pq"),
        greatest(
          fdiv(lit(1000000000L) * $"mw".cast("decimal(38,0)"), $"m"),
          lit(1L)).as("qq"))
      .select($"g", $"ns",
        fdiv(($"pq" - $"qq").cast("decimal(38,0)") *
          ($"pq" - $"qq").cast("decimal(38,0)"),
          $"qq".cast("decimal(38,0)")).as("term"))
    terms.groupBy($"g")
      .agg(
        max($"ns").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_words"),
        sum($"term").cast("long").as("chi2_num"),
      )
      .select($"g", $"n_tokens", $"n_words", $"chi2_num",
        round($"chi2_num".cast("double") / lit(1e9), 6).as("chi2"))
  }

  /** CUSUM change-point LOCALIZATION per group — the complement of the
    * drift monitors above: [[histogramL1]]/[[chi2Tokens]] say HOW MUCH
    * a distribution moved; this says WHEN a per-period value series
    * broke from its own trend (Page, "Continuous inspection schemes",
    * Biometrika 1954 — the offline max-deviation form). For each
    * group's period series (t₁ < … < t_N with values x_i):
    *
    *   D_i = |N·S_i − i·S_N|,  S_i = Σ_{j≤i} x_j
    *
    * — the cumulative sum's deviation from the uniform-rate line with
    * all denominators cleared, so every operand is an EXACT DECIMAL
    * (no i/N float, no mean subtraction): both engines agree bit for
    * bit, which is what lets a hash gate pin an argmax. The change
    * point is the period with maximal D (ties → earliest), and
    * `dev_ppm = 10⁶·D_max div (N·S_N)` is the scale-free deviation
    * score (0 = perfectly steady, ½·10⁶ ≈ all mass in one half).
    *
    * Scale shape: one (group, period) pre-aggregation (map-side
    * combined — THE corpus pass), then windows PARTITIONED BY GROUP
    * over the period support (days/hours — bounded, never corpus
    * rows), and a single max_by argmax per group. Groups with S_N = 0
    * emit NULL dev (undefined rate line). Returns
    * (group, n_periods, cp_period, d_max, dev_ppm).
    */
  def cusumChangepoint(
      df: DataFrame,
      groupCol: String,
      periodCol: String,
      valueCol: String,
  ): DataFrame = {
    val per = df
      .groupBy(col(groupCol).as("g"), col(periodCol).as("p"))
      .agg(sum(col(valueCol).cast("long")).as("x"))
    cusumFromPeriods(per).withColumnRenamed("g", groupCol)
  }

  /** Two-sample KOLMOGOROV–SMIRNOV test, integer-exact end to end —
    * the distribution-free complement of [[histogramL1]] (which needs
    * binning) and the chi-square (which needs categories): D =
    * max_x |F_A(x) − F_B(x)| over the EMPIRICAL cdfs. Denominators
    * cleared, every operand an exact integer both engines reproduce
    * bit for bit:
    *
    *   D_num = max_x |n_B·cumA(x) − n_A·cumB(x)|,  D = D_num/(n_A·n_B)
    *
    * and the α = 0.05 rejection (Smirnov's asymptotic critical value
    * c = 1.358) is decided WITHOUT libm: D > c·√((n_A+n_B)/(n_A·n_B))
    * ⟺ D_num²·10⁶ > 1 844 164·(n_A+n_B)·n_A·n_B (squares cleared,
    * 1.358² = 1.844164 exactly) — an integer comparison, so the
    * verdict is deterministic across engines, not a libm-sqrt
    * coin-flip at the boundary.
    *
    * Scale shape: ONE (value) groupBy builds both sides' counts in the
    * same pass (map-side combined — THE corpus pass); the cumulative
    * window runs over the VALUE SUPPORT only, guarded in-plan by the
    * prCurve cap (`spark.graft.scoreSupportMaxRows` — an unbinned
    * high-cardinality double fails loudly; quantize first). Decimal
    * headroom for the squared comparison is guarded at n_A + n_B ≤
    * 10⁸ (beyond that KS rejects everything anyway — subsample or
    * bin). Requires an integer-castable value column; `sideCol` is a
    * boolean (true = sample A). Returns one row:
    * (n_a, n_b, d_num, d_stat, ks_x, reject_05) with ks_x the argmax
    * value (smallest on ties, the cusum pin).
    */
  def ksTwoSample(
      df: DataFrame,
      valueCol: String,
      sideCol: String,
  ): DataFrame =
    ksFromCounts(df
      .filter(col(sideCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("x"))
      .agg(
        sum(when(col(sideCol), 1L).otherwise(0L)).as("ca"),
        sum(when(!col(sideCol), 1L).otherwise(0L)).as("cb")))

  /** The KS finish over an already-aggregated (x, ca, cb) count table
    * — split exactly like [[chi2FromCounts]]/[[cusumFromPeriods]]: the
    * per-value counts are MERGEABLE, so a complete-mode stream holds
    * them as its state and this finish is a view over that state
    * (q_stream_ks).
    */
  def ksFromCounts(hist: DataFrame): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val cap = spark.conf
      .getOption("spark.graft.scoreSupportMaxRows").map(_.toLong)
      .getOrElse(100000L)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val wAsc = org.apache.spark.sql.expressions.Window.orderBy($"x")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = hist.agg(sum($"ca").cast("long").as("n_a"),
      sum($"cb").cast("long").as("n_b"))
    val cum = hist
      .withColumn("cuma", sum(dec($"ca")).over(wAsc))
      .withColumn("cumb", sum(dec($"cb")).over(wAsc))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"x")))
      .crossJoin(broadcast(tot))
      .select(
        when($"__rn" > cap, raise_error(lit(
          s"ksTwoSample: value support exceeds " +
            s"spark.graft.scoreSupportMaxRows=$cap rows — quantize or " +
            "bin the value first")))
          .otherwise($"x").as("x"),
        abs(dec($"n_b") * $"cuma" - dec($"n_a") * $"cumb").as("dn"),
        $"n_a", $"n_b")
    cum.groupBy($"n_a", $"n_b")
      .agg(
        max($"dn").as("dnd"),
        max_by($"x", struct($"dn", expr("-x"))).as("ks_x"))
      .select(
        when($"n_a" + $"n_b" > 100000000L, raise_error(lit(
          "ksTwoSample: n_a + n_b exceeds the 1e8 decimal-headroom " +
            "guard for the exact squared comparison — subsample or bin")))
          .otherwise($"n_a").as("n_a"),
        $"n_b",
        $"dnd".cast("long").as("d_num"),
        round($"dnd".cast("double") /
          ($"n_a".cast("double") * $"n_b".cast("double")), 6).as("d_stat"),
        $"ks_x",
        ($"dnd" * $"dnd" * lit(1000000L) >
          dec(lit(1844164L)) * dec($"n_a" + $"n_b") * dec($"n_a") * dec($"n_b"))
          .as("reject_05"))
  }

  /** GROUPED two-sample KS — [[ksTwoSample]] fanned out per group in
    * ONE corpus pass (the [[chi2Tokens]] monitoring shape): for every
    * group, D between the group's `sideCol = true` slice and its
    * reference slice (`sideCol = false` — a baseline period, a control
    * cohort, the trusted pipeline), all denominators cleared so the
    * per-group verdict is the same integer-exact decision as the
    * ungrouped test. A group with an empty side has no defined cdf
    * pair: d_stat is NULL and reject_05 false (d_num is 0 by
    * construction), mirroring cusum's NULL-dev contract.
    *
    * Scale shape: ONE (group, value) groupBy builds every group's
    * count pair in the same map-side-combined pass; every window after
    * it is PARTITIONED BY GROUP over that group's value support only
    * (per-group supports are what the prCurve cap bounds — the
    * in-plan raise is per group); the finish is one
    * max/max_by aggregate per group. Returns one row per group:
    * (group, n_a, n_b, d_num, d_stat, ks_x, reject_05).
    */
  def ksGrouped(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      sideCol: String,
  ): DataFrame =
    ksFromCountsGrouped(df
      .filter(col(sideCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("long").as("x"))
      .agg(
        sum(when(col(sideCol), 1L).otherwise(0L)).as("ca"),
        sum(when(!col(sideCol), 1L).otherwise(0L)).as("cb")))
      .withColumnRenamed("g", groupCol)

  /** The grouped-KS finish over an already-aggregated (g, x, ca, cb)
    * count table — same mergeable-state split as [[ksFromCounts]], so
    * a complete-mode stream can hold the (g, x) counts and monitor
    * every group's KS verdict continuously.
    */
  def ksFromCountsGrouped(hist: DataFrame): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val cap = spark.conf
      .getOption("spark.graft.scoreSupportMaxRows").map(_.toLong)
      .getOrElse(100000L)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"x")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    val cum = hist
      .withColumn("cuma", sum(dec($"ca")).over(wAsc))
      .withColumn("cumb", sum(dec($"cb")).over(wAsc))
      .withColumn("n_a", sum($"ca").over(wAll).cast("long"))
      .withColumn("n_b", sum($"cb").over(wAll).cast("long"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"x")))
      .select(
        $"g",
        when($"__rn" > cap, raise_error(lit(
          s"ksGrouped: a group's value support exceeds " +
            s"spark.graft.scoreSupportMaxRows=$cap rows — quantize or " +
            "bin the value first")))
          .otherwise($"x").as("x"),
        abs(dec($"n_b") * $"cuma" - dec($"n_a") * $"cumb").as("dn"),
        $"n_a", $"n_b")
    cum.groupBy($"g", $"n_a", $"n_b")
      .agg(
        max($"dn").as("dnd"),
        max_by($"x", struct($"dn", expr("-x"))).as("ks_x"))
      .select(
        when($"n_a" + $"n_b" > 100000000L, raise_error(lit(
          "ksGrouped: a group's n_a + n_b exceeds the 1e8 decimal-headroom " +
            "guard for the exact squared comparison — subsample or bin")))
          .otherwise($"g").as("g"),
        $"n_a", $"n_b",
        $"dnd".cast("long").as("d_num"),
        when($"n_a" === 0 || $"n_b" === 0, lit(null).cast("double"))
          .otherwise(round($"dnd".cast("double") /
            ($"n_a".cast("double") * $"n_b".cast("double")), 6)).as("d_stat"),
        $"ks_x",
        ($"dnd" * $"dnd" * lit(1000000L) >
          dec(lit(1844164L)) * dec($"n_a" + $"n_b") * dec($"n_a") * dec($"n_b"))
          .as("reject_05"))
  }

  /** The CUSUM localization over an already-aggregated (g, p, x)
    * period table — split from [[cusumChangepoint]] exactly like
    * [[chi2FromCounts]]: the per-period sums are MERGEABLE, so a
    * complete-mode stream holds them as its state (groups × periods
    * rows however many micro-batches arrive) and this finish is a
    * view over that state (q_stream_changepoint).
    */
  def cusumFromPeriods(per: DataFrame): DataFrame = {
    val spark = per.sparkSession
    import spark.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"p")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    val cum = per
      .withColumn("i", count(lit(1)).over(wOrd))
      .withColumn("s", sum(dec($"x")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sn", sum(dec($"x")).over(wAll))
      .withColumn("d", abs(dec($"n") * $"s" - dec($"i") * $"sn"))
    cum.groupBy($"g")
      .agg(
        max($"n").as("n_periods"),
        // argmax with pinned ties: max D first, then the EARLIEST
        // period — struct ordering makes it one map-side-combinable
        // pass (the labelPropagation argmax trick)
        max_by($"p", struct($"d", expr("-i"))).as("cp_period"),
        // D ≤ N·S_N can exceed long headroom at large corpora; a bare
        // non-ANSI cast would NULL silently, contradicting the
        // exact-decimal/fail-loud contract — same raise_error pattern
        // as MlEval.auc's doubled Mann-Whitney U.
        when(max($"d") > lit(Long.MaxValue).cast("decimal(38,0)"),
          raise_error(concat(lit("cusum: max deviation D "),
            max($"d").cast("string"),
            lit(" exceeds long headroom; pre-scale the value column"))))
          .otherwise(max($"d")).cast("long").as("d_max"),
        max($"sn").as("sn"),
      )
      .select(
        $"g",
        $"n_periods",
        $"cp_period",
        $"d_max",
        when($"sn" === 0, lit(null)).otherwise(
          fdiv(lit(1000000L) * dec($"d_max"), dec($"n_periods") * $"sn"))
          .as("dev_ppm"),
      )
  }
}
