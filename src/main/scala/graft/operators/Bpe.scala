package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.):
  * learn the top-N merges from corpus statistics, then tokenize with
  * them — the vocabulary-construction stage of an LLM data pipeline.
  *
  * The corpus first collapses to the DISTINCT-WORD table with
  * frequencies (one groupBy — at 100 TB the word table is orders of
  * magnitude smaller than the corpus, which is why classic BPE trainers
  * operate on it). Each of the N fixed iterations is then:
  *
  *   1. adjacent-symbol pair counts, frequency-weighted, per position
  *      (overlaps count) — explode + one groupBy over the word table;
  *   2. the argmax pair (count desc, then lexicographic — a total,
  *      engine-independent order) — a 1-ROW collect: like the k-means
  *      centroid fetch or the connected-components checksum, it is the
  *      learned model parameter of the round, not data volume;
  *   3. merge application as a LEFT FOLD inside each row
  *      (`aggregate` HOF): scanning left to right, fuse `a·b` whenever
  *      the accumulator ends with `a` and the next symbol is `b` — the
  *      standard greedy-left BPE application, e.g. merge (a,a) on
  *      "aaa" → [aa, a]. Pure narrow map, no shuffle;
  *   4. `localCheckpoint` to stop the per-iteration plan from nesting
  *      N folds deep (same lineage rule as Components' loop).
  *
  * Returns the tokenized word table `(word, freq, n_tokens, tokens)` —
  * the applied merges are fully determined by it, so an oracle that
  * re-learns the merges independently verifies the training loop.
  */
object Bpe {

  /** `docs(text)` → distinct words with corpus frequencies, tokenized
    * by `nMerges` learned BPE merges.
    */
  def train(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val syms = $"syms"
    var words = docs
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w")
      .agg(count(lit(1)).as("freq"))
      // per-char symbol array (the scala-side substring builder has no
      // (col, col, col) overload, so the lambda goes through expr)
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .localCheckpoint(true)

    (0 until nMerges).foreach { _ =>
      val pairs = words
        // guard: sequence(1, 0) DESCENDS in Spark, so a fully-merged
        // 1-token word would index out of bounds instead of no-op
        .filter(size(syms) >= 2)
        .select($"freq",
          explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i - 1] AS a, syms[i] AS b))")).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"freq").as("n"))
      val top = pairs.orderBy($"n".desc, $"a", $"b").limit(1).collect()
      if (top.nonEmpty) {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        val merged = concat(lit(a), lit(b))
        words = words
          .withColumn("syms",
            aggregate(
              syms,
              array().cast("array<string>"),
              (acc, s) =>
                when(
                  size(acc) > 0 &&
                    element_at(acc, -1) === lit(a) && s === lit(b),
                  concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
                  .otherwise(concat(acc, array(s)))))
          .localCheckpoint(true)
      }
    }
    words.select(
      $"w".as("word"),
      $"freq",
      size(syms).cast("long").as("n_tokens"),
      concat_ws(" ", syms).as("tokens"))
  }

  /** Tokenizer APPLICATION — encode a corpus with a trained vocabulary
    * (the token-counting stage every pretraining mixture runs with the
    * real tokenizer, not the whitespace proxy): per document, the BPE
    * token count and an order-canonical digest of its full token
    * stream.
    *
    * Scale shape: tokenization is NOT recomputed per occurrence — the
    * per-word token split was already learned on the distinct-word
    * table ([[train]]), so application is one positional explode of
    * the corpus and ONE equi-join on the word key (the classic
    * vocab-apply join; sort-merge at vocabulary scale, broadcast when
    * the vocab fits). The per-doc reduction is a single doc_id-keyed
    * aggregation; the stream digest orders tokens by word position
    * inside the row (`array_sort(collect_list(struct(pos, …)))` — the
    * same in-row canonicalization as dropCommonLines), so no global
    * sort exists anywhere.
    */
  def encode(docs: DataFrame, vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .filter(length($"w") > 0)
      .join(vocab.select($"word".as("w"), $"n_tokens", $"tokens"), "w")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum($"n_tokens").as("n_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct($"pos", $"tokens"))),
            x => x.getField("tokens")),
          " ")).as("token_digest"),
      )
  }
}
