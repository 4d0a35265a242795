package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weight-proportional sampling — systematic PPS
  * (probability proportional to size; Madow, "On the theory of
  * systematic sampling", 1949): order the corpus by a deterministic
  * hash shuffle, take cumulative weights C_i, and select item i with
  * multiplicity
  *
  *   m_i = ⌊C_i·k/W⌋ − ⌊C_{i−1}·k/W⌋
  *
  * — a size-k sample (Σ m_i = k exactly, telescoping) where
  * E[m_i] = k·w_i/W, entirely in INTEGER arithmetic: no RNG state, no
  * u^(1/w) float keys (whose libm pow/log would diverge across
  * engines), every retry/epoch/oracle selecting the IDENTICAL sample.
  * The hash order stands in for the random permutation systematic
  * sampling needs; fnv63(id) is the engine's cross-engine shuffle key.
  * Items with w_i ≥ W/k are selected with multiplicity ≥ 1
  * deterministically (m_i ≥ ⌊k·w_i/W⌋ — the oversized-unit property
  * of systematic PPS).
  *
  * The 100-TB shape — the naive formulation needs ONE GLOBAL ordered
  * cumsum (a single-partition window, the exact anti-pattern the
  * prCurve guard exists for). Instead, two-level prefix sums:
  * items hash into `buckets` strata; the within-bucket cumsum is a
  * PARTITIONED window (n/B rows each); bucket totals (B rows) get
  * prefix offsets in a bounded B-row window and broadcast back; the
  * global position is `bucket_prefix + within_cumsum`. The global
  * order this realizes is (bucket, hash, id) = (fnv63(id) mod B,
  * fnv63(id), id) — still a deterministic hash shuffle, and a
  * single-node oracle can reproduce it with one plain cumsum over
  * that ORDER BY (different program shape, same integers).
  *
  * Returns the selected rows with `sample_weight` = m_i (≥ 1).
  * Weights must be positive longs — zero/negative weights fail loudly
  * in-plan rather than silently skewing the cumulative line.
  */
object Sampling {

  def systematicPps(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Long,
      buckets: Int = 64,
  ): DataFrame = {
    require(k >= 1, s"systematicPps: k must be >= 1, got $k")
    require(buckets >= 1, s"systematicPps: buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def fdiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("decimal(38,0)")
    val h = graft.functions.Fnv63Hash.hash(spark, col(idCol).cast("string"))
    val w = when(col(weightCol).cast("long") > 0, col(weightCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("systematicPps: non-positive weight "),
        col(weightCol).cast("string"),
        lit(" — weights must be positive"))))
    val keyed = df
      .withColumn("__h", h)
      .withColumn("__b", pmod(col("__h"), lit(buckets.toLong)))
      .withColumn("__w", w)
    // within-bucket cumulative weight: a PARTITIONED window
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIn = keyed.withColumn("__cin", sum(dec(col("__w"))).over(wIn))
    // bucket prefix offsets: ≤ `buckets` rows, bounded window
    val wB = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = keyed.groupBy(col("__b"))
      .agg(sum(dec(col("__w"))).as("__bt"))
      .withColumn("__prefix", sum(col("__bt")).over(wB) - col("__bt"))
    val totals = prefixes.agg(
      (max(col("__prefix") + col("__bt"))).as("__wtot"))
    val positioned = cumIn
      .join(broadcast(prefixes.select(col("__b"), col("__prefix"))), "__b")
      .crossJoin(broadcast(totals))
      .withColumn("__c", col("__prefix") + col("__cin"))
    positioned
      .withColumn("sample_weight",
        (fdiv(dec(col("__c")) * lit(k), dec(col("__wtot"))) -
          fdiv((dec(col("__c")) - dec(col("__w"))) * lit(k), dec(col("__wtot"))))
          .cast("long"))
      .filter(col("sample_weight") > 0)
      .drop("__h", "__b", "__w", "__cin", "__prefix", "__wtot", "__c")
  }
}
