package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashBits

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

  /** Distinct word n-gram shingles per document: (doc_id, sh). */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val ws = split(col("text"), " ")
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    docs
      .select(col("doc_id"),
        explode(when(size(ws) >= n, grams).otherwise(array())).as("sh"))
      .distinct()
  }

  /** MinHash signature rows (doc_id, seed, mh): mh = lexicographic min
    * of `md5(seed ':' shingle)` over the doc's shingle set — a valid
    * min-wise hash family because md5 is uniform and strings compare
    * totally.
    */
  def minhash(sh: DataFrame, nSeeds: Int): DataFrame =
    sh.select(col("doc_id"), explode(sequence(lit(0), lit(nSeeds - 1))).as("seed"), col("sh"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("sh")))).as("mh"))

  /** LSH banding: group `rowsPerBand` consecutive minhashes, hash each
    * band; docs sharing any (band, band_hash) are candidates.
    */
  def minhashBands(mh: DataFrame, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", (col("seed").cast("double") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(
        md5(array_join(
          transform(array_sort(collect_list(struct(col("seed"), col("mh")))), x => x.getField("mh")),
          "|")).as("band_hash"))

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
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    words
      .select(col("doc_id"), explode(sequence(lit(0), lit(63))).as("b"), col("w"))
      .select(col("doc_id"), col("b"),
        when(HashBits.nibbleBit(md5(col("w")), col("b")) === 1, lit(1))
          .otherwise(lit(-1)).as("v"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("v")).as("s"))
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("b"),
            when(col("s") >= 0, lit("1")).otherwise(lit("0")).as("bit")))),
          x => x.getField("bit")),
        "").as("simhash"))
  }

  /** Hamming distance between two equal-length bit-string columns. */
  def hamming(a: Column, b: Column, bits: Int): Column =
    aggregate(
      sequence(lit(1), lit(bits)),
      lit(0),
      (acc, i) => acc + when(a.substr(i, lit(1)) === b.substr(i, lit(1)), 0).otherwise(1))

  /** Band a bit-string signature into `nBands` contiguous slices for
    * LSH candidate generation: (doc_id, simhash, band, band_hash).
    */
  def bitBands(sig: DataFrame, sigCol: String, bits: Int, nBands: Int): DataFrame = {
    val w = bits / nBands
    sig
      .select(col("doc_id"), col(sigCol),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_hash", col(sigCol).substr(col("band") * w + 1, lit(w)))
  }
}
