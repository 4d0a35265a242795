package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Text deduplication operators for a large-scale training-data
  * pipeline: exact, MinHash+LSH, SimHash, and inverted-index n-gram
  * Jaccard.
  *
  * Everything is declarative DataFrame code — shingling and signatures
  * are higher-order array functions (whole-stage codegen, no UDFs), and
  * candidate generation is always a key-equality join (band hash or
  * shingle), never an all-pairs product. The only shuffles are the
  * groupBys/joins on those keys, which is what keeps each operator
  * linear-ish in corpus size at 100 TB:
  *
  *   - MinHash-LSH: O(docs × shingles) map side, shuffle on (band,
  *     band_hash); near-dup pairs come out of equal-hash buckets.
  *   - SimHash: O(docs × words × 64) map side (integer ±1 sums —
  *     order-free), shuffle on 16-bit signature bands.
  *   - n-gram Jaccard: inverted-index join on shingles, with a
  *     document-frequency cap as the skew guard (a stop-shingle that
  *     appears in half the corpus would otherwise create a quadratic
  *     hot bucket).
  *
  * Exact intersection counts for verification are computed only for
  * the (small) candidate set, via joins that Catalyst turns into
  * broadcast joins when candidates are few.
  */
object TextDedup {

  /** Distinct word n-gram shingles per document: (doc_id, sh).
    *
    * The split word array is materialized through a Generate boundary
    * (`explode(array(split(...)))`) — without it, CollapseProject
    * inlines the `split` alias into every `element_at`, re-tokenizing
    * the document O(words) times per row (measured 10× slower).
    */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val ws = col("ws")
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    docs
      .select(col("doc_id"), Cols.materialized(split(col("text"), " ")).as("ws"))
      .select(col("doc_id"),
        explode(when(size(ws) >= n, grams).otherwise(array())).as("sh"))
      .distinct()
  }

  /** MinHash signatures, one wide row per doc (mh_0..mh_{n-1}): mh_s =
    * lexicographic min of `md5(s ':' shingle)` over the doc's shingle
    * set — a valid min-wise hash family because md5 is uniform and
    * strings compare totally. All n mins come out of ONE map-side
    * partial aggregation over the shingle table: no seed explosion, no
    * n× shuffle volume — the shape that matters when the shingle table
    * is 100 TB.
    */
  def minhashSignature(sh: DataFrame, nSeeds: Int): DataFrame = {
    val aggs = (0 until nSeeds).map { s =>
      min(md5(concat(lit(s.toString), lit(":"), col("sh")))).as(s"mh_$s")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a wide signature: hash each group of
    * `rowsPerBand` consecutive minhashes (band_hash = md5("mh_i|mh_j"),
    * byte-compatible with a row-wise string_agg formulation). Narrow
    * op — one output row per (doc, band) via a generated array, no
    * shuffle.
    */
  def minhashBands(sig: DataFrame, nSeeds: Int, rowsPerBand: Int): DataFrame = {
    require(nSeeds % rowsPerBand == 0,
      s"nSeeds ($nSeeds) must be divisible by rowsPerBand ($rowsPerBand) — " +
        "trailing minhashes would be silently dropped from banding")
    val bandCols = (0 until nSeeds / rowsPerBand).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)).as("band_hash"))
    }
    sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_hash").as("band_hash"))
  }

  /** Candidate pairs from any equal-key banding table with columns
    * (doc_id, band, band_hash).
    */
  def bandPairs(bands: DataFrame): DataFrame =
    bands
      .as("a")
      .join(
        bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** Exact Jaccard for a candidate pair set, computed against the full
    * shingle table (pairs are small → broadcast-join shaped).
    * Output: (doc_a, doc_b, jaccard) with jaccard rounded to 4 dp
    * (an integer ratio — identical in any engine).
    */
  def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(
        col("doc_a"),
        col("doc_b"),
        round(col("i") / (col("ca.n") + col("cb.n") - col("i")), 4).as("jaccard"))
  }

  /** 64-bit SimHash per document as a '0'/'1' string (bit 0 first).
    * Bits come from term-frequency-weighted ±1 sums over `md5(word)`
    * bits — integer arithmetic, aggregation-order-free. `sum >= 0`
    * maps to '1'.
    */
  def simhash(docs: DataFrame): DataFrame = {
    // one md5 per word, 64 ±1 bits as an array column, then 64
    // map-side-combinable integer sums — a single shuffle of partial
    // sums per doc instead of a 64× exploded row stream. Each stage
    // (digest, nibble values, bit array) is materialized through its
    // own Generate boundary; otherwise CollapseProject inlines the
    // alias into every downstream reference (the md5 would run 64×
    // per word, the bits array 64× per aggregate — measured ~50×
    // slower). Bit derivation after the digest is pure integer math.
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), Cols.materialized(md5(col("w"))).as("h"))
      .select(col("doc_id"), Cols.materialized(transform(sequence(lit(0), lit(15)),
        p => conv(col("h").substr(p + 1, lit(1)), 16, 10).cast("int"))).as("nibs"))
      .select(col("doc_id"),
        Cols.materialized(transform(sequence(lit(0), lit(63)), b => {
          val nib = element_at(col("nibs"), (b.cast("double") / 4).cast("int") + 1)
          val div = when(b % 4 === 0, 1).when(b % 4 === 1, 2).when(b % 4 === 2, 4).otherwise(8)
          when((nib.cast("double") / div).cast("int") % 2 === 1, lit(1)).otherwise(lit(-1))
        })).as("bits"))
    val sums = (0 until 64).map(i => sum(element_at(col("bits"), i + 1)).as(s"s_$i"))
    words
      .groupBy(col("doc_id"))
      .agg(sums.head, sums.tail: _*)
      .select(
        col("doc_id"),
        concat((0 until 64).map(i =>
          when(col(s"s_$i") >= 0, lit("1")).otherwise(lit("0"))): _*).as("simhash"),
        // the same 64 bits packed into two longs, for xor/bit_count
        // hamming downstream (integer ops instead of 128 substrs/pair)
        (0 until 32).map(i =>
          when(col(s"s_$i") >= 0, lit(1L << (31 - i))).otherwise(lit(0L)))
          .reduce(_ + _).as("sim_hi"),
        (32 until 64).map(i =>
          when(col(s"s_$i") >= 0, lit(1L << (63 - i))).otherwise(lit(0L)))
          .reduce(_ + _).as("sim_lo"),
      )
  }

  /** Hamming distance between two equal-length bit-string columns. */
  def hamming(a: Column, b: Column, bits: Int): Column =
    aggregate(
      sequence(lit(1), lit(bits)),
      lit(0),
      (acc, i) => acc + when(a.substr(i, lit(1)) === b.substr(i, lit(1)), 0).otherwise(1))

  /** Band a bit-string signature into `nBands` contiguous slices for
    * LSH candidate generation; preserves all input columns and adds
    * (band, band_hash).
    */
  def bitBands(sig: DataFrame, sigCol: String, bits: Int, nBands: Int): DataFrame = {
    val w = bits / nBands
    sig
      .select(col("*"), explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_hash", col(sigCol).substr(col("band") * w + 1, lit(w)))
  }
}
