package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation primitives for a training-data pipeline: the
  * "did the quality model work" pass that closes the curation loop the
  * reference's filter stages open (score → filter → train → EVALUATE).
  * Three operators, each a single aggregation pass in exact integer /
  * DECIMAL(38,0) arithmetic with one terminal double rounding, so the
  * DuckDB hash gate holds bit-for-bit:
  *
  *   - [[linearProbe]] — per-group ordinary-least-squares fit of
  *     y ~ x by the closed-form normal equations (slope, intercept,
  *     R²). The entire fit is ONE map-side-combinable aggregation to
  *     six sufficient statistics per group (n, Σx, Σy, Σxy, Σx², Σy²);
  *     at 100 TB that is a single pass over the corpus and k tiny
  *     rows out — the classic "train a linear probe per domain" shape.
  *   - [[auc]] — exact ROC-AUC per group via the midrank
  *     Mann–Whitney U statistic, computed on the SCORE HISTOGRAM
  *     (group by (g, score), cumulative negatives over distinct
  *     scores) rather than per-row ranks: the window is partitioned
  *     by group and sized by the score support, never the row count.
  *   - [[calibration]] — reliability table (observed positive rate vs
  *     mean predicted probability per score bin), with the predicted
  *     probability carried as an EXACT ppm integer so the per-bin mean
  *     is an exact decimal ratio, not an order-dependent double sum.
  *
  * All division is deferred to the last select and performed on exact
  * decimal operands cast to double with the identical expression shape
  * the oracles use, then rounded — the q_embed cosine discipline.
  */
object MlEval {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-group simple OLS `y = b0 + b1·x` via normal equations.
    *
    * Emits (group, n, slope, intercept, r2):
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
    *   r2 = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * Numerators/denominators are exact DECIMAL(38,0) (inputs are
    * integral); each output is a single double division of exact
    * operands, rounded to 6 dp. Degenerate groups (zero x-variance →
    * slope undefined; zero y-variance → r2 undefined) yield NULL
    * rather than a division blow-up.
    *
    * Scale shape: one aggregation with map-side partials; no window,
    * no join, no second pass. The 38-digit headroom holds to corpus
    * sums of ~1e18 per product term (x,y ≤ 1e6 and n ≤ 1e12 leaves
    * nΣxy ≤ 1e30).
    */
  def linearProbe(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
  ): DataFrame = {
    val x = dec(col(xCol))
    val y = dec(col(yCol))
    val sums = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(x).as("sx"),
      sum(y).as("sy"),
      sum(x * y).as("sxy"),
      sum(x * x).as("sxx"),
      sum(y * y).as("syy"),
    )
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    val inum = col("sy") * col("sxx") - col("sx") * col("sxy")
    sums.select(
      col(groupCol),
      col("n").cast("long").as("n"),
      when(denx === 0, lit(null)).otherwise(
        round(num.cast("double") / denx.cast("double"), 6)).as("slope"),
      when(denx === 0, lit(null)).otherwise(
        round(inum.cast("double") / denx.cast("double"), 6)).as("intercept"),
      when(denx === 0 || deny === 0, lit(null)).otherwise(
        round((num.cast("double") * num.cast("double")) /
          (denx.cast("double") * deny.cast("double")), 6)).as("r2"),
    )
  }

  /** Per-group exact ROC-AUC of an integer score against a 0/1 label,
    * with the standard midrank treatment of ties:
    *
    *   2U = Σ_over distinct scores s  pos(s) · (2·negBelow(s) + neg(s))
    *   AUC = U / (n₊ · n₋)
    *
    * computed entirely on the (group, score) histogram: a map-side-
    * combinable count, a cumulative-sum window PARTITIONED BY GROUP
    * over the score support (bounded by the score's value range — for
    * the ‰-quantized quality logit ≤ a few thousand distinct values,
    * never the corpus row count), and a final per-group roll-up. `u2`
    * (the doubled U, exact) is emitted alongside the rounded ratio so
    * the gate pins the integer statistic, not just 6 dp of the ratio.
    * Groups with no positives or no negatives have undefined AUC →
    * NULL.
    */
  def auc(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String,
  ): DataFrame = {
    val hist = df
      .groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(
        sum(col(labelCol).cast("long")).as("pos"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("neg"),
      )
    val w = Window.partitionBy(col(groupCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cumneg", sum(dec(col("neg"))).over(w) - dec(col("neg")))
    val agg = cum.groupBy(col(groupCol)).agg(
      sum(col("pos")).cast("long").as("n_pos"),
      sum(col("neg")).cast("long").as("n_neg"),
      sum(dec(col("pos")) * (lit(2) * col("cumneg") + dec(col("neg")))).as("u2d"),
    )
    agg.select(
      col(groupCol),
      col("n_pos"),
      col("n_neg"),
      col("u2d").cast("long").as("u2"),
      when(col("n_pos") === 0 || col("n_neg") === 0, lit(null)).otherwise(
        round(col("u2d").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
          6)).as("auc"),
    )
  }

  /** Reliability (calibration) table for an integer ‰-scaled logit
    * against a 0/1 label. The logit is squashed with the same
    * algebraic sigmoid as `TextAnalysis.modelQuality` — but kept as an
    * EXACT ppm integer, score_ppm = 500000 + (500000·l) fdiv (1000+|l|)
    * (floor division via the pmod identity, exact in long arithmetic)
    * — so the per-bin mean prediction is an exact decimal ratio, free
    * of double accumulation order. Bins are floor(l / binWidth),
    * again by the pmod identity so Spark's truncating `div` and any
    * floor-division oracle agree on negatives (the subtracted pmod
    * makes the dividend an exact multiple, where truncation = floor).
    *
    * Emits (bin, n, pos, pos_rate, mean_pred_ppm): one histogram
    * aggregation, bin count bounded by the logit range / binWidth.
    * A calibrated model shows pos_rate ≈ mean_pred_ppm/1e6 per bin.
    */
  def calibration(
      df: DataFrame,
      logitCol: String,
      labelCol: String,
      binWidth: Long = 500L,
  ): DataFrame = {
    val l = col(logitCol).cast("long")
    // exact floor division helpers: subtract pmod first, then the
    // quotient of the exact multiple is sign-safe in both engines
    def fdiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    val scorePpm = (lit(500000L) +
      fdiv(lit(500000L) * l, lit(1000L) + abs(l))).as("score_ppm")
    val bin = fdiv(l, lit(binWidth)).as("bin")
    df.select(bin, scorePpm, col(labelCol).cast("long").as("lbl"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("lbl")).as("pos"),
        sum(dec(col("score_ppm"))).as("sppm"),
      )
      .select(
        col("bin"),
        col("n"),
        col("pos"),
        round(col("pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round(col("sppm").cast("double") / col("n").cast("double"), 2)
          .as("mean_pred_ppm"),
      )
  }
}
