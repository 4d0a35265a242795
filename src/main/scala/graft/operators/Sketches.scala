package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram sketch + approximate quantiles — the
  * deterministic, mergeable alternative to `approx_percentile`
  * (GK/KLL sketches give tighter errors but their state depends on
  * arrival order and implementation; integer bin counts merge by
  * addition and reproduce bit-for-bit in any engine, which is what
  * the oracle gate and any cross-system reconciliation need).
  *
  * Error model: a quantile lands within one bin width
  * ((hi−lo)/bins) of the true value — choose bins to taste; the
  * sketch state is O(bins) longs regardless of input size.
  *
  * Scale shape: binning is a narrow map; the count is ONE groupBy
  * with map-side partial aggregation (the shuffle moves ≤ bins rows
  * per task); everything after operates on the ≤ bins-row histogram —
  * metadata scale, where the single-partition cumulative window is
  * free, not a bottleneck.
  */
object Sketches {

  /** Clamped bin id for `v` in [lo, hi) over `bins` equal widths.
    * Float ops are written in one fixed order ((v−lo)·bins, then the
    * divide) so any engine computes the identical IEEE sequence.
    */
  def binOf(v: Column, lo: Double, hi: Double, bins: Int): Column =
    least(
      greatest(
        floor((v.cast("double") - lit(lo)) * lit(bins.toDouble) / lit(hi - lo))
          .cast("long"),
        lit(0L)),
      lit(bins - 1L))

  /** (bin, cnt) histogram — the mergeable sketch state. */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo, s"histogram: need bins >= 2 and hi > lo")
    df.select(binOf(value, lo, hi, bins).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Approximate quantiles from the histogram: for each q, the
    * smallest bin whose cumulative count reaches ceil(q·n), reported
    * as that bin's UPPER edge (a one-sided ≤ one-bin-width error).
    * Output: (q, bin, approx_value, cum_count, n).
    */
  def histogramQuantiles(
      df: DataFrame,
      value: Column,
      lo: Double,
      hi: Double,
      bins: Int,
      qs: Seq[Double],
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"histogramQuantiles: quantiles must be in (0, 1]")
    val h = histogram(df, value, lo, hi, bins)
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = h.select(
      col("bin"), col("cnt"),
      sum(col("cnt")).over(wCum).as("cum"),
      sum(col("cnt")).over(wAll).as("n"))
    val qdf = explode(array(qs.map(lit): _*)).as("q")
    val picked = cum
      .select(col("bin"), col("cum"), col("n"), qdf)
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(col("q"))
      .agg(min(col("bin")).as("bin"))
    picked
      .join(cum, "bin")
      .select(
        col("q"),
        col("bin"),
        (lit(lo) + (col("bin") + 1) * (lit(hi) - lit(lo)) / lit(bins.toDouble))
          .as("approx_value"),
        col("cum").as("cum_count"),
        col("n"))
  }
}
