package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis

/** Corpus-screening additions to the text-analysis family: character
  * entropy (encoding-garbage detection), Gopher-style per-rule quality
  * flags, and cross-source vocabulary overlap — the three screens a
  * curation run adds once the basic quality/langid gate exists
  * (reference semantics: the documents-table screening surface,
  * SURVEY §2 text-analysis extensions).
  */
object TextFilters {

  private val alphabet: Seq[String] = ('a' to 'z').map(_.toString) :+ " "

  /** Per-doc character Shannon entropy over [a-z ]: one narrow in-row
    * pass (`TextAnalysis.charEntropy`), zero shuffles — the plan is a
    * scan + project, nothing else. DuckDB recomputes the same
    * length-difference counts and the same −Σ p·log₂p fold.
    */
  private val textCharEntropy = Q(
    "q_text_char_entropy",
    (s, dir) => {
      import s.implicits._
      TextAnalysis.charEntropy(Tables(s, dir).documents, alphabet)
        .orderBy($"doc_id")
    },
    Some {
      val alphaSql = alphabet.map(c => s"'$c'").mkString("[", ",", "]")
      s"""WITH c AS (
         |  SELECT doc_id,
         |         list_transform($alphaSql,
         |           ch -> length(text) - length(replace(text, ch, ''))) AS cnts
         |  FROM documents
         |),
         |t AS (SELECT doc_id, cnts, list_sum(cnts) AS total FROM c)
         |SELECT doc_id, CAST(total AS BIGINT) AS n_alpha,
         |       round(list_sum(list_transform(cnts, x ->
         |         CASE WHEN x > 0
         |              THEN -(x / CAST(total AS DOUBLE)) * log2(x / CAST(total AS DOUBLE))
         |              ELSE 0.0 END)), 4) AS entropy_bits
         |FROM t
         |ORDER BY doc_id""".stripMargin
    },
  )

  /** Gopher rule flags with corpus-derived stopwords
    * (`TextAnalysis.gopherFlags`): word-count / mean-word-length /
    * alphabetic-ratio / stopword-presence rules as per-rule ints plus
    * the conjunctive keep. The stopword list is the corpus's own top-8
    * words (bounded driver fetch); the oracle re-derives the same top-8
    * with the same (count DESC, word) tie-break in SQL.
    */
  private val textGopherRules = Q(
    "q_text_gopher_rules",
    (s, dir) => {
      import s.implicits._
      TextAnalysis.gopherFlags(Tables(s, dir).documents, nStop = 8)
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (
           |  SELECT doc_id, length(text) AS chars, string_split(text, ' ') AS ws
           |  FROM documents
           |),
           |top8 AS (
           |  SELECT word FROM (
           |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
           |  GROUP BY word ORDER BY count(*) DESC, word LIMIT 8
           |),
           |stops AS (SELECT list(word) AS stoplist FROM top8),
           |m AS (
           |  SELECT doc_id,
           |         CAST(len(ws) AS BIGINT) AS n_words,
           |         round((chars - (len(ws) - 1)) * 1.0 / len(ws), 4) AS mean_word_len,
           |         round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
           |               * 1.0 / len(ws), 4) AS alpha_ratio,
           |         CAST(len(list_intersect(list_distinct(ws), stoplist)) AS BIGINT) AS n_stop
           |  FROM w, stops
           |)
           |SELECT doc_id, n_words, mean_word_len, alpha_ratio, n_stop,
           |       CAST(n_words BETWEEN 50 AND 100000 AS BIGINT) AS f_words,
           |       CAST(mean_word_len BETWEEN 3 AND 10 AS BIGINT) AS f_mwl,
           |       CAST(alpha_ratio >= 0.8 AS BIGINT) AS f_alpha,
           |       CAST(n_stop >= 2 AS BIGINT) AS f_stop,
           |       CAST(n_words BETWEEN 50 AND 100000
           |            AND mean_word_len BETWEEN 3 AND 10
           |            AND alpha_ratio >= 0.8
           |            AND n_stop >= 2 AS BIGINT) AS keep
           |FROM m
           |ORDER BY doc_id""".stripMargin),
  )

  /** Pairwise bigram-vocabulary Jaccard between sources — the corpus
    * diagnostic for "which subcorpora repeat each other" (mixture
    * design wants near-duplicate SOURCES surfaced before near-dup
    * DOCS). Distinct (source, bigram) rows, one equi-join on the
    * bigram key; per-bigram fanout is bounded by C(|sources|, 2) and
    * sources are a bounded dimension, so the join is linear in the
    * distinct-bigram table at any corpus size. Exact counterpart of
    * the KMV-sketch Jaccard gate (q_sketch_kmv_jaccard) — that one
    * trades exactness for fixed size; this one is the audit tool.
    */
  private val textVocabOverlap = Q(
    "q_text_vocab_overlap",
    (s, dir) => {
      import s.implicits._
      val ws = Tables(s, dir).documents
        .select($"source", graft.functions.Cols.materialized(split($"text", " ")).as("w"))
      val bg = ws.select($"source", explode(transform(
          sequence(lit(1), size($"w") - 1),
          i => concat_ws(" ", element_at($"w", i), element_at($"w", i + 1)))).as("b"))
        .distinct()
      val sz = bg.groupBy($"source").agg(count(lit(1)).as("n"))
      val inter = bg.select($"source".as("s1"), $"b")
        .join(bg.select($"source".as("s2"), $"b"), Seq("b"))
        .filter($"s1" < $"s2")
        .groupBy($"s1", $"s2").agg(count(lit(1)).as("n_common"))
      inter
        .join(sz.select($"source".as("s1"), $"n".as("n1")), "s1")
        .join(sz.select($"source".as("s2"), $"n".as("n2")), "s2")
        .select($"s1", $"s2", $"n_common",
          round($"n_common".cast("double") / ($"n1" + $"n2" - $"n_common"), 4)
            .as("jaccard"))
        .orderBy($"s1", $"s2")
    },
    Some("""WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
           |bg AS (
           |  SELECT DISTINCT source, w[i] || ' ' || w[i+1] AS b
           |  FROM ws, unnest(range(1, len(w))) t(i)
           |),
           |sz AS (SELECT source, count(*) AS n FROM bg GROUP BY source),
           |inter AS (
           |  SELECT a.source AS s1, b.source AS s2, count(*) AS n_common
           |  FROM bg a JOIN bg b ON a.b = b.b AND a.source < b.source
           |  GROUP BY 1, 2
           |)
           |SELECT i.s1, i.s2, i.n_common,
           |       round(i.n_common * 1.0 / (x.n + y.n - i.n_common), 4) AS jaccard
           |FROM inter i
           |JOIN sz x ON x.source = i.s1
           |JOIN sz y ON y.source = i.s2
           |ORDER BY i.s1, i.s2""".stripMargin),
  )

  val all: Seq[Q] = Seq(textCharEntropy, textGopherRules, textVocabOverlap)
}
