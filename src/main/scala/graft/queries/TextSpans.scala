package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-document repeated-span detection: the "dedup the SPANS, not
  * the documents" pass (Lee et al., *Deduplicating Training Data Makes
  * Language Models Better* — their ExactSubstr variant) that catches
  * boilerplate shared across otherwise-distinct pages, which
  * whole-document MinHash misses by design.
  *
  * Suffix arrays don't distribute; the standard scalable equivalent is
  * fixed-length n-gram voting: hash every word 8-gram with its
  * position, count DISTINCT documents per gram across the corpus, and
  * merge the positions of grams seen in ≥ 2 documents into maximal
  * per-document spans (gaps-and-islands). Scale shape: gram
  * generation is a narrow in-row map (same Generate-materialized
  * shingle machinery as MinHash); the df count is a map-side-combined
  * aggregation on the 128-bit digest, NEVER the gram text; the
  * positions join is an equi-join on digest; the island merge is one
  * window pass per document partition. No stage is quadratic in corpus
  * size — the candidate volume tracks repeated-text density.
  */
object TextSpans {

  private val n = 8          // gram width, words
  private val minDocs = 2    // repeated = seen in >= 2 distinct docs

  private val repeatedNgrams = Q(
    "q_text_repeated_ngrams",
    (s, dir) => {
      import s.implicits._
      val ws = col("ws")
      // (doc_id, pos, key): every word 8-gram with its 1-based start
      val grams = Tables(s, dir).documents
        .select($"doc_id", split($"text", " ").as("ws"))
        .filter(size(ws) >= n)
        .select($"doc_id", explode(transform(
          sequence(lit(1), size(ws) - (n - 1)),
          i => struct(i.as("pos"),
            md5(concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*))
              .as("key")))).as("g"))
        .select($"doc_id", $"g.pos", $"g.key")
      val repeated = grams
        .groupBy($"key")
        .agg(count_distinct($"doc_id").as("n_docs"))
        .filter($"n_docs" >= minDocs)
        .select($"key")
      // positions of repeated grams, merged to maximal spans per doc:
      // a new island starts when this gram's start clears the running
      // max end of everything before it by more than 1 (adjacent or
      // overlapping spans fuse)
      val hits = grams.join(repeated, "key")
        .select($"doc_id", $"pos", ($"pos" + (n - 1)).as("end"))
      val wOrd = Window.partitionBy($"doc_id").orderBy($"pos")
      hits
        .withColumn("prev_max_end",
          max($"end").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when($"prev_max_end".isNull || $"pos" > $"prev_max_end" + 1, 1L)
            .otherwise(0L))
        .withColumn("island", sum($"new_island").over(
          wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").as("span_start"), max($"end").as("span_end"),
          count(lit(1)).as("n_grams"))
        .select($"doc_id", $"span_start", $"span_end", $"n_grams")
        .orderBy($"doc_id", $"span_start")
    },
    Some(s"""WITH w AS (
            |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            |),
            |grams AS (
            |  SELECT doc_id, i AS pos,
            |         md5(array_to_string(ws[i:i+${n - 1}], ' ')) AS key
            |  FROM w, unnest(range(1, greatest(len(ws) - ${n - 2}, 1))) AS t(i)
            |  WHERE len(ws) >= $n
            |),
            |repeated AS (
            |  SELECT key FROM grams GROUP BY key
            |  HAVING count(DISTINCT doc_id) >= $minDocs
            |),
            |hits AS (
            |  SELECT g.doc_id, g.pos, g.pos + ${n - 1} AS "end"
            |  FROM grams g JOIN repeated r ON g.key = r.key
            |),
            |isl AS (
            |  SELECT doc_id, pos, "end",
            |         CASE WHEN max("end") OVER (PARTITION BY doc_id ORDER BY pos
            |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
            |               OR pos > max("end") OVER (PARTITION BY doc_id ORDER BY pos
            |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
            |              THEN 1 ELSE 0 END AS new_island
            |  FROM hits
            |),
            |grp AS (
            |  SELECT doc_id, pos, "end",
            |         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
            |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            |  FROM isl
            |)
            |SELECT doc_id, min(pos) AS span_start, max("end") AS span_end,
            |       count(*) AS n_grams
            |FROM grp GROUP BY doc_id, island
            |ORDER BY doc_id, span_start""".stripMargin),
  )

  val all: Seq[Q] = Seq(repeatedNgrams)
}
