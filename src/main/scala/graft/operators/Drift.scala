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
}
