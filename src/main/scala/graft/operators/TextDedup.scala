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

  /** Distinct word n-gram shingles per document as ONE ARRAY row:
    * (doc_id, shs). `array_distinct` dedupes inside the row, so no
    * shuffle is spent deduplicating shingles — which in turn lets the
    * signature stage stay a narrow map (see [[minhashSignature]]).
    *
    * The split word array and the shingle array are each materialized
    * through a Generate boundary (`explode(array(...))`) — without it,
    * CollapseProject inlines the alias into every consumer,
    * re-tokenizing the document O(words) times per row (measured 10×
    * slower).
    */
  def shingleArrays(docs: DataFrame, n: Int): DataFrame = {
    val ws = col("ws")
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
    docs
      .select(col("doc_id"), Cols.materialized(split(col("text"), " ")).as("ws"))
      .select(col("doc_id"),
        Cols.materialized(
          array_distinct(when(size(ws) >= n, grams).otherwise(array()))).as("shs"))
  }

  /** Distinct word n-gram shingles per document, exploded:
    * (doc_id, sh) — the inverted-index / set-intersection form.
    */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    shingleArrays(docs, n).select(col("doc_id"), explode(col("shs")).as("sh"))

  /** MinHash signatures, one wide row per doc (mh_0..mh_{n-1}):
    * ONE md5 per shingle, split into two 60-bit integers
    * (h1 = hex chars 1-15, h2 = chars 17-31), and seed hashes derived
    * arithmetically — `g_s = h1 + s·h2` (Kirsch-Mitzenmacher double
    * hashing, a standard min-wise family given a uniform base hash);
    * mh_s = min over the doc's shingle set. Versus hashing
    * `md5(s ':' shingle)` per seed this cuts digest work n-fold on
    * the map side — the term that dominates at corpus scale.
    *
    * Input is the [[shingleArrays]] form, so each signature is
    * `array_min(zip_with(...))` — a NARROW map with no shuffle and no
    * aggregation; 100 TB of documents signature in one pass of the
    * scan. Documents with no shingles (fewer than n words) are
    * excluded — an empty set has no min, and all-null signatures
    * would otherwise band together as spurious candidates. nSeeds ≤ 8
    * keeps `h1 + 7·h2 < 2⁶³` (no overflow, also exactly wrap-free in
    * the DuckDB oracle's BIGINT arithmetic).
    */
  def minhashSignature(docShingles: DataFrame, nSeeds: Int): DataFrame = {
    require(nSeeds >= 1 && nSeeds <= 8,
      s"minhashSignature: nSeeds ($nSeeds) must be in [1, 8] — " +
        "h1 + s*h2 must stay below 2^63 for 60-bit halves")
    val sigs = (0 until nSeeds).map { s =>
      array_min(zip_with(col("h1s"), col("h2s"),
        (a, b) => a + lit(s.toLong) * b)).as(s"mh_$s")
    }
    docShingles
      .filter(size(col("shs")) >= 1)
      // one digest per shingle; each derived array gets its own
      // Generate boundary (one generator per select) so CollapseProject
      // can't re-inline the md5 into both halves
      .select(col("doc_id"),
        Cols.materialized(transform(col("shs"), g => md5(g))).as("hs"))
      .select(col("doc_id"), col("hs"),
        Cols.materialized(transform(col("hs"),
          h => conv(h.substr(1, 15), 16, 10).cast("long"))).as("h1s"))
      .select(col("doc_id"),
        Cols.materialized(transform(col("hs"),
          h => conv(h.substr(17, 15), 16, 10).cast("long"))).as("h2s"),
        col("h1s"))
      .select(col("doc_id") +: sigs: _*)
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
    *
    * `maxBucket` is the SATURATION GUARD — the LSH form of join-skew
    * salting: a bucket holding w docs emits w(w−1)/2 pairs, and
    * corpus-wide shared shingles (boilerplate suffixes, headers — the
    * things a real corpus is full of) produce buckets whose width
    * grows WITH THE CORPUS, turning the candidate join quadratic.
    * Those pairs are overwhelmingly Jaccard-rejected false positives
    * (the docs share only the boilerplate); genuinely similar pairs
    * also collide in their content bands, which stay narrow. Buckets
    * wider than `maxBucket` are therefore dropped whole: the width
    * count shuffles on the same key as the pair join (linear), the
    * saturated set is tiny by construction, and membership is a
    * BROADCAST anti-join — so the cap costs one linear pass and
    * removes the only super-linear term in the dedup pipeline.
    * (Observed concretely: redaction tokens shared by every document
    * made one bucket per band hold a constant fraction of the corpus;
    * at 10× the bench SF the uncapped candidate join went 100×.)
    */
  /** Default saturation cap for gate queries: comfortably above any
    * true duplicate-cluster width in a deduplicated corpus (clusters
    * get MORE NUMEROUS with corpus growth, not wider), far below the
    * corpus-fraction widths boilerplate produces.
    */
  val DefaultMaxBucket: Int = 50

  def bandPairs(bands: DataFrame, maxBucket: Int = Int.MaxValue): DataFrame = {
    val capped =
      if (maxBucket == Int.MaxValue) bands
      else {
        val hot = bands
          .groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("__w"))
          .filter(col("__w") > maxBucket)
          .select(col("band"), col("band_hash"))
        bands.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
      }
    capped
      .as("a")
      .join(
        capped.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** CROSS-table LSH candidate pairs (corpus × probe) — the
    * decontamination / reference-lookup shape, where near-dups are
    * sought between a huge corpus and a SMALL fixed set (an eval
    * benchmark, a blocklist) rather than within one table. Emits
    * every (doc_a ∈ bandsA, doc_b ∈ bandsB) sharing a band bucket;
    * doc ids must come from disjoint namespaces (a doc present on
    * both sides would pair with itself).
    *
    * Scale shape: the probe side is broadcast — the corpus never
    * shuffles for the join, so the whole candidate pass is one narrow
    * scan of corpus bands against an executor-local hash map. The
    * saturation cap is shared with [[bandPairs]] and counted over the
    * UNION of both sides: a boilerplate bucket here costs
    * |corpus bucket| × |probe bucket| pairs — linear in the corpus
    * per hot bucket (the probe side is fixed), but each such pair
    * still pays exact-Jaccard verification, so saturated buckets are
    * dropped whole for the same reason as in the self-join.
    */
  def bandPairsAcross(
      bandsA: DataFrame, bandsB: DataFrame,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val (ca, cb) =
      if (maxBucket == Int.MaxValue) (bandsA, bandsB)
      else {
        val hot = bandsA.unionByName(bandsB)
          .groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("__w"))
          .filter(col("__w") > maxBucket)
          .select(col("band"), col("band_hash"))
        (bandsA.join(broadcast(hot), Seq("band", "band_hash"), "left_anti"),
          bandsB.join(broadcast(hot), Seq("band", "band_hash"), "left_anti"))
      }
    ca.as("a")
      .join(
        broadcast(cb.as("b")),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard for a candidate pair set, computed against the full
    * shingle table (pairs are small → broadcast-join shaped).
    * Output: (doc_a, doc_b, jaccard) with jaccard rounded to 4 dp
    * (an integer ratio — identical in any engine).
    *
    * The 2-arg form aggregates set sizes from the exploded table; when
    * the caller already has the [[shingleArrays]] form, pass
    * `cnt = arr.select(doc_id, size(shs) as n)` and the size side
    * becomes a narrow map instead of a 1-per-shingle-row aggregation.
    */
  def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame =
    jaccard(pairs, sh, sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n")))

  def jaccard(pairs: DataFrame, sh: DataFrame, cnt: DataFrame): DataFrame = {
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

  /** Prefix-filtered candidate pairs for an EXACT Jaccard-threshold
    * join (the PPJoin candidate generator): order all shingles
    * globally by `(document frequency ASC, shingle)` — rarest first —
    * and emit pairs of documents sharing at least one shingle inside
    * BOTH prefixes, where a document's prefix is its first
    * `L = n − ⌈(tPct/100)·n⌉ + 1` shingles under that order.
    *
    * Completeness (no false negatives): Jaccard ≥ t forces overlap
    * `i ≥ ⌈t·n⌉` for both documents; the EARLIEST common shingle in
    * the global order has the other ≥ i−1 common shingles after it in
    * each document's sorted set, so its position is ≤ n − i + 1 ≤ L
    * in both — it lies inside both prefixes. Verification (exact
    * [[jaccard]] over the full sets) then trims the superset.
    *
    * Scale shape: no global rank is ever computed — `(df, sh)` is the
    * comparison key itself, so each document sorts its own shingle
    * array IN-ROW after one df equi-join, and the candidate join is
    * an equi-join on prefix shingles, which rare-first ordering biases
    * to low document frequency (a df=1 shingle generates zero pairs).
    * The high-df mass that makes naive inverted-index joins quadratic
    * is systematically pushed OUT of prefixes.
    *
    * @param arr  [[shingleArrays]] output `(doc_id, shs)`
    * @param tPct Jaccard threshold in percent (1-99); candidates are
    *             complete for any verify threshold ≥ tPct/100
    */
  def prefixFilterCandidates(arr: DataFrame, tPct: Int): DataFrame = {
    require(tPct >= 1 && tPct <= 99, s"tPct must be in [1,99] (got $tPct)")
    val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
    val dfTbl = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // ⌈tPct·n/100⌉ = (tPct·n + 99) div 100 — exact integer arithmetic
    // (the double division is safe: numerator < 2^53, cast truncates)
    val need = ((lit(tPct) * size(col("ordered")) + 99) / 100).cast("int")
    val prefixes = sh.join(dfTbl, "sh")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ordered"))
      .select(col("doc_id"),
        explode(slice(col("ordered"), lit(1), size(col("ordered")) - need + 1)).as("p"))
      .select(col("doc_id"), col("p.sh").as("sh"))
    prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 64-bit SimHash per document as a '0'/'1' string (bit 0 first).
    * Bits come from term-frequency-weighted ±1 sums over `md5(word)`
    * bits — integer arithmetic, aggregation-order-free. `sum >= 0`
    * maps to '1'.
    */
  def simhash(docs: DataFrame): DataFrame = {
    // one md5 per word, its first 16 hex chars parsed ONCE into two
    // 32-bit integers (h1 = chars 0-7 → bits 0-31, h2 = chars 8-15 →
    // bits 32-63); each of the 64 per-bit aggregates is then a long
    // shift+mask — no per-word nibble/bit ARRAYS at all. (The previous
    // formulation built a 16-element conv() array plus a 64-element
    // ±1 array per word occurrence and read them back through 64
    // element_at aggregates — measured ~4× slower at sf0.1.) The ±1
    // sum s_b = 2·(count of set bits) − n, so the sign test is
    // `2·c_b >= n` with one extra count(*) aggregate; bit values are
    // unchanged from the nibble formulation (hex char b/4,
    // little-endian bit b%4 within the nibble), so signatures — and
    // the DuckDB oracle — are bit-identical. The md5 is materialized
    // through a Generate boundary so CollapseProject can't inline one
    // digest per substr.
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), Cols.materialized(md5(col("w"))).as("h"))
      .select(col("doc_id"),
        conv(col("h").substr(1, 8), 16, 10).cast("long").as("h1"),
        conv(col("h").substr(9, 8), 16, 10).cast("long").as("h2"))
    // bit b of the digest: hex char c = b/4 sits at shift 28-4c within
    // its 8-char word; little-endian bit b%4 inside the nibble
    def bit(h: Column, b: Int): Column =
      shiftright(h, (28 - 4 * (b / 4)) + (b % 4)).bitwiseAND(lit(1L))
    val counts = (0 until 64).map(b =>
      sum(bit(if (b < 32) col("h1") else col("h2"), b % 32)).as(s"c_$b"))
    def one(b: Int): Column = col(s"c_$b") * 2 >= col("nw")
    words
      .groupBy(col("doc_id"))
      .agg(counts.head, (counts.tail :+ count(lit(1)).as("nw")): _*)
      .select(
        col("doc_id"),
        concat((0 until 64).map(b =>
          when(one(b), lit("1")).otherwise(lit("0"))): _*).as("simhash"),
        // the same 64 bits packed into two longs, for xor/bit_count
        // hamming downstream (integer ops instead of 128 substrs/pair)
        (0 until 32).map(b =>
          when(one(b), lit(1L << (31 - b))).otherwise(lit(0L)))
          .reduce(_ + _).as("sim_hi"),
        (32 until 64).map(b =>
          when(one(b), lit(1L << (63 - b))).otherwise(lit(0L)))
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

  /** CCNet-style text normalization for FUZZY-EXACT dedup: lowercase,
    * non-alphanumerics to spaces, runs of spaces collapsed, ends
    * trimmed. Hashing the normalized form catches the
    * case/punctuation/whitespace variants of a document that exact
    * content hashing misses, at exact-dedup cost (narrow codegen'd
    * string ops + one hash groupBy) — the cheap first rung below
    * MinHash. Patterns are dialect-portable (plain character classes,
    * no Java/RE2-specific syntax), same contract as the PII scrub
    * rules in [[TextAnalysis]].
    */
  def normalized(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Every word k-gram of every document WITH its 1-based start
    * position: (doc_id, pos, gh) where gh = md5 of the k words joined
    * by a single space. Unlike [[shingleArrays]] this keeps duplicates
    * and positions — the inverted-index form for SPAN-level (not
    * document-level) dedup. Narrow: split once per doc behind a
    * Generate boundary, one md5 per position, no shuffle.
    *
    * `sequence(1, size-k+1)` is guarded (Spark's `sequence(1, 0)`
    * DESCENDS rather than returning empty), so sub-k-word docs emit
    * zero positions instead of garbage.
    */
  def gramPositions(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"gramPositions: k ($k) must be >= 2")
    val ws = col("ws")
    docs
      .select(col("doc_id"), Cols.materialized(split(col("text"), " ")).as("ws"))
      .select(col("doc_id"), ws,
        explode(when(size(ws) >= k, sequence(lit(1), size(ws) - (k - 1)))
          .otherwise(array())).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ",
          (0 until k).map(j => element_at(ws, col("pos") + j)): _*)).as("gh"))
  }

  /** Exact repeated-substring detection ACROSS documents, the
    * span-level complement of the document-level near-dup family
    * (cf. Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" — there via a single-machine suffix array; here
    * as the distributed k-gram-inverted-index equivalent): a word
    * position is *duplicated* when its exact k-gram occurs in at
    * least `minDocs` distinct documents; maximal runs of consecutive
    * duplicated positions become spans `(doc_id, start_word,
    * span_words)` with span_words = run + k − 1, reported when
    * span_words ≥ `minSpanWords`. A training pipeline cuts these
    * spans out of the kept copy instead of dropping whole documents.
    *
    * Scale shape — every stage is keyed, never all-pairs:
    *   1. positions: narrow map, O(total words) rows (the same cost
    *      any shingling pass pays);
    *   2. duplicated grams: per-doc `distinct` then count ≥ minDocs —
    *      two hash aggregations on the gram hash, both with map-side
    *      partial aggregation;
    *   3. marking: LEFT SEMI join positions→dup-grams on gh. Semi
    *      join semantics make boilerplate grams (a gram in half the
    *      corpus) safe: the build side carries ONE row per gram, so a
    *      hot gram cannot replicate rows the way an inner join on an
    *      exploded index would;
    *   4. islands: one shuffle on doc_id, the gaps-and-islands
    *      row_number trick, O(one doc's marks) memory per task.
    *
    * The position table is persisted — it feeds both the dup-gram
    * aggregation and the marking join (same convention as
    * minhashVerifiedPairs: Verify/Bench clearCache between queries).
    */
  def crossDocRepeatedSpans(
      docs: DataFrame,
      k: Int,
      minSpanWords: Int,
      minDocs: Int = 2,
  ): DataFrame = {
    require(minSpanWords >= k,
      s"crossDocRepeatedSpans: minSpanWords ($minSpanWords) must be >= k ($k) — " +
        "a single duplicated position already spans k words")
    val pos = gramPositions(docs, k).persist()
    val dupGrams = pos
      .select(col("gh"), col("doc_id")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("gh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    pos
      .join(dupGrams, Seq("gh"), "left_semi")
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("pos")).as("start_word"),
        (count(lit(1)) + (k - 1)).as("span_words"))
      .filter(col("span_words") >= minSpanWords)
      .select(col("doc_id"), col("start_word"), col("span_words"))
  }
}
