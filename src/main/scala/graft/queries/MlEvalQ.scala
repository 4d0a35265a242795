package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{MlEval, TextAnalysis}

/** Model-evaluation gates: the "did the quality model work" pass that
  * closes the curation loop (score → filter → train → EVALUATE), plus
  * the per-domain linear probe a data team fits to sanity-check a
  * feature. All three ride `operators.MlEval`'s exact-arithmetic
  * sufficient-statistic shapes: one aggregation pass each, divisions
  * deferred to the terminal select, the identical IEEE expression
  * order mirrored in the DuckDB oracles.
  *
  * The evaluated model is `TextAnalysis.modelQuality`'s ‰-integer
  * logit (the learned-filter stage already under the gate as
  * q_text_model_quality); the weak label is `lang = 'en'` — the
  * standard "does the English-tuned quality score separate English
  * from the rest" check (cf. Gopher/C4-style quality filtering,
  * where stopword/TTR features are English-biased by construction).
  */
object MlEvalQ {

  /** The modelQuality integer-logit derivation as oracle CTEs, with
    * source + the en label carried through — textually the same
    * program as q_text_model_quality's oracle (`// is div` holds:
    * every operand is nonnegative).
    */
  private def logitCtes: String =
    s"""WITH base AS (
       |  SELECT doc_id, source, lang,
       |         CAST(length(text) AS BIGINT) AS chars,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_words,
       |         CAST(len(list_filter(string_split(text, ' '), w -> w IN (${TextAnalysis.defaultStopwords.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS stop_hits
       |  FROM documents
       |),
       |l AS (
       |  SELECT doc_id, source,
       |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lbl,
       |         2 * ((distinct_words * 1000) // words) +
       |         3 * ((stop_hits * 1000) // words) +
       |         1 * least(words * 10, 1000) +
       |         (-1) * abs(((chars - (words - 1)) * 1000) // words - 5000) +
       |         (-1000) AS logit
       |  FROM base
       |)""".stripMargin

  /** Per-source OLS probe of vocabulary richness against length:
    * distinct_words ~ words. One map-side-combinable aggregation to
    * six sufficient statistics per source, closed-form
    * slope/intercept/R² from exact DECIMAL(38,0) operands — the
    * 100 TB "fit a linear probe per domain" pass (single corpus scan,
    * 20 tiny rows out). The oracle repeats the normal equations over
    * HUGEINT sums with the identical terminal double expressions.
    */
  private val linearProbe = Q(
    "q_ml_linear_probe",
    (s, dir) => {
      import s.implicits._
      val ws = $"ws"
      val feats = Tables(s, dir).documents
        .select($"source",
          graft.functions.Cols.materialized(split($"text", " ")).as("ws"))
        .select($"source",
          size(ws).cast("long").as("words"),
          size(array_distinct(ws)).cast("long").as("distinct_words"))
      MlEval.linearProbe(feats, "source", "words", "distinct_words")
        .orderBy($"source")
    },
    Some("""WITH f AS (
           |  SELECT source,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
           |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
           |  FROM documents
           |),
           |s AS (
           |  SELECT source,
           |         CAST(count(*) AS HUGEINT) AS n,
           |         CAST(sum(x) AS HUGEINT) AS sx,
           |         CAST(sum(y) AS HUGEINT) AS sy,
           |         CAST(sum(x * y) AS HUGEINT) AS sxy,
           |         CAST(sum(x * x) AS HUGEINT) AS sxx,
           |         CAST(sum(y * y) AS HUGEINT) AS syy
           |  FROM f GROUP BY source
           |)
           |SELECT source,
           |       CAST(n AS BIGINT) AS n,
           |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
           |         round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |               CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
           |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
           |         round(CAST(sy * sxx - sx * sxy AS DOUBLE) /
           |               CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS intercept,
           |       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL ELSE
           |         round((CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)) /
           |               (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r2
           |FROM s
           |ORDER BY source""".stripMargin),
  )

  /** Per-source exact midrank ROC-AUC of the quality logit against
    * the en label. The doubled Mann–Whitney U rides as an exact
    * integer column (`u2`) so the gate pins the statistic itself, not
    * just 6 dp of the ratio; sources that are all-English or
    * English-free at a given SF yield NULL identically in both
    * engines. Window is partitioned by source over the logit support
    * — bounded by the ‰ feature quantization, never the corpus size.
    */
  private val aucQ = Q(
    "q_ml_auc",
    (s, dir) => {
      import s.implicits._
      val scored = TextAnalysis
        .modelQuality(Tables(s, dir).documents, keep = Seq("source", "lang"))
        .select($"source", $"logit_scaled",
          ($"lang" === "en").cast("long").as("lbl"))
      MlEval.auc(scored, "source", "logit_scaled", "lbl")
        .orderBy($"source")
    },
    Some(s"""$logitCtes,
            |c AS (
            |  SELECT source, logit AS s,
            |         CAST(sum(lbl) AS BIGINT) AS pos,
            |         CAST(count(*) - sum(lbl) AS BIGINT) AS neg
            |  FROM l GROUP BY source, logit
            |),
            |w AS (
            |  SELECT source, pos, neg,
            |         CAST(sum(neg) OVER (PARTITION BY source ORDER BY s
            |           ROWS UNBOUNDED PRECEDING) - neg AS HUGEINT) AS cumneg
            |  FROM c
            |),
            |a AS (
            |  SELECT source,
            |         CAST(sum(pos) AS BIGINT) AS n_pos,
            |         CAST(sum(neg) AS BIGINT) AS n_neg,
            |         CAST(sum(CAST(pos AS HUGEINT) * (2 * cumneg + neg)) AS BIGINT) AS u2
            |  FROM w GROUP BY source
            |)
            |SELECT source, n_pos, n_neg, u2,
            |       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
            |         round(CAST(u2 AS DOUBLE) /
            |               (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) END AS auc
            |FROM a
            |ORDER BY source""".stripMargin),
  )

  /** Corpus-wide reliability table: per 0.5-logit bin, observed
    * positive rate vs mean predicted probability — the predicted
    * probability carried as modelQuality's algebraic sigmoid at EXACT
    * ppm (floor division via the pmod identity, sign-safe in both
    * engines), so the per-bin mean is an exact decimal ratio with no
    * double accumulation order. Bin count is bounded by the logit
    * range / 500, not the corpus.
    */
  private val calibrationQ = Q(
    "q_ml_calibration",
    (s, dir) => {
      import s.implicits._
      val scored = TextAnalysis
        .modelQuality(Tables(s, dir).documents, keep = Seq("lang"))
        .select($"logit_scaled", ($"lang" === "en").cast("long").as("lbl"))
      MlEval.calibration(scored, "logit_scaled", "lbl", binWidth = 500L)
        .orderBy($"bin")
    },
    Some(s"""$logitCtes,
            |p AS (
            |  SELECT (logit - ((logit % 500 + 500) % 500)) // 500 AS bin,
            |         500000 + (500000 * logit -
            |           ((500000 * logit % (1000 + abs(logit)) + (1000 + abs(logit)))
            |             % (1000 + abs(logit)))) // (1000 + abs(logit)) AS score_ppm,
            |         lbl
            |  FROM l
            |),
            |g AS (
            |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
            |         CAST(sum(lbl) AS BIGINT) AS pos,
            |         CAST(sum(CAST(score_ppm AS HUGEINT)) AS HUGEINT) AS sppm
            |  FROM p GROUP BY bin
            |)
            |SELECT bin, n, pos,
            |       round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
            |       round(CAST(sppm AS DOUBLE) / CAST(n AS DOUBLE), 2) AS mean_pred_ppm
            |FROM g
            |ORDER BY bin""".stripMargin),
  )

  def all: Seq[Q] = Seq(linearProbe, aucQ, calibrationQ)
}
