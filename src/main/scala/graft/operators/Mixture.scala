package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-based mixture sampling — the data-mixing stage of a
  * pretraining pipeline: given a corpus partitioned into groups
  * (source, language, domain), draw a target number of documents with
  * per-group rates proportional to `n_group^alpha`. `alpha < 1`
  * flattens the natural distribution (rare groups are upweighted
  * relative to their share), `alpha = 1` is proportional sampling,
  * `alpha = 0` is uniform-per-group.
  *
  * Determinism is the design constraint: rates are computed in scaled
  * INTEGER arithmetic (weights quantized to 1e-3, rates to basis
  * points) so distributed partial-aggregation order can't flip a
  * float bit, and the keep/drop decision per row is a pure function
  * of its id — a unit-stride lattice `(id * 7919) mod 10000` rather
  * than `rand()` — so the exact sample is re-derivable at 100 TB
  * without ever materializing it, and composes with downstream stages
  * run in a later job.
  *
  * Scale shape: one map-side-combined count per group (tiny result),
  * rates broadcast back onto the corpus, then a narrow filter. No
  * corpus-sized shuffle anywhere.
  */
object Mixture {

  /** Per-group sampling rates in basis points for a temperature-0.5
    * mixture targeting `targetTotal` sampled rows overall.
    *
    * `w_g = round(sqrt(n_g) * 1000)` (exact: IEEE sqrt is correctly
    * rounded); `rate_bp = min(10000, (w_g * targetTotal * 10000) div
    * (sum_w * n_g))` — all integer ops, so any engine computes the
    * identical table. Groups whose fair share exceeds their size cap
    * at 10000 (keep everything); the realized total then undershoots
    * `targetTotal` slightly, which is the standard behavior (the
    * alternative — redistributing the surplus — needs an iterative
    * fixpoint for no practical gain).
    */
  def temperatureRates(
      df: DataFrame,
      groupCol: String,
      targetTotal: Long,
  ): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_total"))
    val w = counts.withColumn("w", round(sqrt(col("n_total")) * 1000).cast("long"))
    val tot = w.agg(sum(col("w")).as("sum_w"))
    w.crossJoin(broadcast(tot))
      .withColumn(
        "rate_bp",
        least(
          lit(10000L),
          expr(s"(w * ${targetTotal * 10000L}L) div (sum_w * n_total)")),
      )
      .select(col(groupCol), col("n_total"), col("rate_bp"))
  }

  /** Apply `temperatureRates` output to the corpus: keep a row iff its
    * id's lattice point `(id * 7919) mod 10000` falls below the
    * group's rate. 7919 is coprime to 10000, so consecutive ids
    * equidistribute over the bucket range (three-distance theorem —
    * gaps take at most 3 values), giving each group a within-±few‰
    * realized rate without any randomness. Output carries the rate
    * columns for downstream accounting.
    */
  def sample(df: DataFrame, rates: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.join(broadcast(rates), groupCol)
      .filter(pmod(col(idCol) * lit(7919L), lit(10000L)) < col("rate_bp"))

  /** Per-domain document cap (the FineWeb-style guard against a
    * handful of domains dominating the mixture): keep at most `cap`
    * documents per group, chosen by md5-permutation priority — a
    * deterministic uniform subset, re-derivable at any scale, not a
    * "first N in file order" bias.
    *
    * Scale shape: rank-within-group with a `row_number <= cap` filter
    * is the pattern Catalyst rewrites to WindowGroupLimit — each map
    * task pre-truncates its groups to `cap` rows BEFORE the exchange,
    * so the shuffle carries at most (groups × cap) rows per task, not
    * the corpus (same machinery q_window_topk_per_group plan-asserts).
    * The md5 priority key needs no global sort anywhere.
    */
  def domainCap(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1 (got $cap)")
    import org.apache.spark.sql.expressions.Window
    val okey = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(groupCol)).orderBy(okey.asc, col(idCol).asc)
    df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= cap)
  }

  /** Epoch upsampling — the other half of mixture weighting that
    * [[sample]]'s rate cap forecloses: a rare group whose target share
    * EXCEEDS its size is repeated across epochs (rate 25 000 bp =
    * every doc twice, plus a deterministic half of them a third time).
    * Standard pretraining practice for scarce high-value domains
    * (multi-epoch rare data vs single-epoch web crawl).
    *
    * `rates` is [[temperatureRates]] WITHOUT the 10 000 bp cap
    * ([[upsampleRates]]): n_copies(row) = rate_bp div 10⁴, plus one
    * iff the row's lattice point `(id·7919) mod 10⁴` falls below
    * `rate_bp mod 10⁴` — so realized group volume tracks the target
    * within ±few ‰, copy counts are a pure function of the id, and
    * the whole operator is a broadcast join + narrow `explode`
    * (sequence per row): zero corpus-sized shuffles. Output repeats
    * each kept row with `epoch` = 0..n_copies−1.
    */
  def upsampleRates(df: DataFrame, groupCol: String, targetTotal: Long): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_total"))
    val w = counts.withColumn("w", round(sqrt(col("n_total")) * 1000).cast("long"))
    val tot = w.agg(sum(col("w")).as("sum_w"))
    w.crossJoin(broadcast(tot))
      .withColumn("rate_bp",
        expr(s"(w * ${targetTotal * 10000L}L) div (sum_w * n_total)"))
      .select(col(groupCol), col("n_total"), col("rate_bp"))
  }

  def upsample(df: DataFrame, rates: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.join(broadcast(rates), groupCol)
      .withColumn("n_copies",
        expr("rate_bp div 10000") +
          when(pmod(col(idCol) * lit(7919L), lit(10000L)) < col("rate_bp") % 10000L, 1L)
            .otherwise(0L))
      .filter(col("n_copies") >= 1L)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1L)))
}
