package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Bloom-filter membership screen — the fixed-size alternative to
  * broadcasting a reference set wholesale.
  *
  * `TextAnalysis.decontaminate` broadcasts every distinct eval n-gram;
  * that is exact but its build side grows with the benchmark. The Bloom
  * screen replaces it with a bit set of FIXED size m: k probe positions
  * per gram (Kirsch-Mitzenmacher double hashing over one md5 digest —
  * the same h1/h2 halves the MinHash family uses), a gram is flagged
  * iff all k probed bits are set. Guarantees:
  *
  *   - no false negatives — every gram actually present in the
  *     reference set probes only set bits, so the flagged set is a
  *     SUPERSET of the exact-match set (BloomSpec proves it against
  *     the exact join);
  *   - false positives at the standard (1 - e^(-kn/m))^k rate, fully
  *     deterministic given the hash family — the oracle reproduces
  *     them bit-for-bit.
  *
  * Scale shape: the bit set is materialized as a DISTINCT-position
  * relation — at most m rows (m/8 bytes as a real bitmap; ≤ a few MB
  * for m = 2^20) no matter how large the reference corpus is, so the
  * probe join stays a broadcast hash join at any benchmark size. The
  * candidate side is one narrow map (digest + k probes) over the
  * corpus scan with map-side-combinable aggregation above it — the
  * shape that survives 100 TB. Typical deployment: Bloom screen first
  * (cheap, fixed-size build side), exact `decontaminate` only over the
  * flagged survivors.
  *
  * Reference analogue: the reference engine has no sketch surface; this
  * extends the training-data-pipeline family (SURVEY.md §2 “beyond the
  * reference” operators) alongside HLL and the histogram sketch.
  */
object Bloom {

  /** Max probes: h1 + (k-1)·h2 with 60-bit halves stays below 2^63
    * for k ≤ 8 — no overflow in Spark or in the oracle's BIGINT math.
    */
  private val MaxK = 8

  /** Distinct Bloom probe positions of one hashed gram, as an array
    * column: positions `(h1 + s·h2) mod m` for s in [0, k). Both
    * halves are nonnegative, so `%` and `pmod` agree — the oracle uses
    * plain `%`.
    */
  private def probeArray(h1: Column, h2: Column, m: Int, k: Int): Column =
    array_distinct(
      transform(sequence(lit(0), lit(k - 1)),
        s => (h1 + s.cast("long") * h2) % lit(m.toLong)))

  /** `(gram, pos)` probe rows for a gram column: one md5 digest per
    * gram, k double-hashed probes, duplicates within a gram collapsed
    * (so downstream all-probes-hit counting is exact).
    */
  private def probes(df: DataFrame, gram: Column, m: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK, s"Bloom: k ($k) must be in [1, $MaxK]")
    require(m >= 2, s"Bloom: m ($m) must be >= 2")
    df.select(df.columns.map(col) :+ Cols.materialized(md5(gram)).as("__hx"): _*)
      .select(df.columns.map(col) :+
        Cols.materialized(probeArray(
          conv(col("__hx").substr(1, 15), 16, 10).cast("long"),
          conv(col("__hx").substr(17, 15), 16, 10).cast("long"),
          m, k)).as("__ps"): _*)
      .select(df.columns.map(col) :+ explode(col("__ps")).as("pos"): _*)
  }

  /** The filter itself, as a relation: the DISTINCT set of bit
    * positions touched by the reference set's `gram` column. At most
    * m rows regardless of reference size — always broadcastable.
    */
  def bits(ref: DataFrame, gram: Column, m: Int, k: Int): DataFrame =
    probes(ref.select(gram.as("g")).distinct(), col("g"), m, k)
      .select(col("pos")).distinct()

  /** Screen `(id, gram)` candidate rows against a bit set built by
    * [[bits]] (same m and k — the caller owns that contract): emits
    * one row per candidate gram with `hit` = 1 iff ALL probes landed
    * on set bits. The bit-set join is broadcast by construction.
    */
  def screenGrams(
      cand: DataFrame,
      id: Column,
      gram: Column,
      bitSet: DataFrame,
      m: Int,
      k: Int,
  ): DataFrame = {
    val p = probes(cand.select(id.as("id"), gram.as("g")), col("g"), m, k)
    // single pass: left-join the broadcast bit set, then one
    // aggregation counts probes and hits together
    p.join(broadcast(bitSet.select(col("pos"), lit(1L).as("__set"))),
        Seq("pos"), "left")
      .groupBy(col("id"), col("g"))
      .agg(
        count(lit(1)).as("__need"),
        sum(coalesce(col("__set"), lit(0L))).as("__got"))
      .select(col("id"), col("g"),
        when(col("__got") === col("__need"), 1L).otherwise(0L).as("hit"))
  }

  /** Per-document decontamination screen: word n-gram shingles of
    * `docs` probed against a Bloom filter of `ref`'s shingles.
    * Output per doc: `n_grams`, `n_flagged` (grams the filter cannot
    * rule out — superset of exact matches), and their ratio.
    */
  def decontaminateScreen(
      docs: DataFrame,
      ref: DataFrame,
      n: Int,
      m: Int,
      k: Int,
  ): DataFrame = {
    val bitSet = bits(TextDedup.shingles(ref, n), col("sh"), m, k)
    val grams = TextDedup.shingles(docs, n)
    screenGrams(grams, col("doc_id"), col("sh"), bitSet, m, k)
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(col("hit")).as("n_flagged"))
      .select(col("id").as("doc_id"), col("n_grams"), col("n_flagged"),
        round(col("n_flagged").cast("double") / col("n_grams"), 4)
          .as("bloom_ratio"))
  }
}
