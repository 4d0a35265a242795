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

  /** Corpus-wide precision/recall/F1 threshold sweep of the quality
    * logit against the en label — the operating-point picker that
    * turns an AUC number into an actual filter threshold. One row per
    * distinct logit value; TP/FP ride as exact longs. The descending
    * cumulative window is global but bounded by the ‰-quantized score
    * support (the `Sketches.quantilesFromHistogram` pattern), and n₊
    * is a 1-row broadcast.
    */
  private val prCurveQ = Q(
    "q_ml_pr_curve",
    (s, dir) => {
      import s.implicits._
      val scored = TextAnalysis
        .modelQuality(Tables(s, dir).documents, keep = Seq("lang"))
        .select($"logit_scaled", ($"lang" === "en").cast("long").as("lbl"))
      MlEval.prCurve(scored, "logit_scaled", "lbl")
        .orderBy($"thr")
    },
    Some(s"""$logitCtes,
            |c AS (SELECT logit AS thr, CAST(sum(lbl) AS BIGINT) AS pos,
            |             CAST(count(*) - sum(lbl) AS BIGINT) AS neg FROM l GROUP BY logit),
            |w AS (SELECT thr, pos, neg,
            |             CAST(sum(pos) OVER (ORDER BY thr DESC ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS tp,
            |             CAST(sum(neg) OVER (ORDER BY thr DESC ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS fp
            |      FROM c),
            |t AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos FROM c)
            |SELECT thr, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
            |       round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
            |       CASE WHEN n_pos = 0 THEN NULL ELSE
            |         round(CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE), 6) END AS recall,
            |       CASE WHEN n_pos = 0 THEN NULL ELSE
            |         round((2.0 * CAST(tp AS DOUBLE)) /
            |               CAST(tp + tp + fp + (n_pos - tp) AS DOUBLE), 6) END AS f1
            |FROM w, t
            |ORDER BY thr""".stripMargin),
  )

  /** Cohen's-kappa agreement audit between the RULE gate
    * (`TextAnalysis.gopherFlags.keep`) and the MODEL gate
    * (modelQuality logit ≥ 0) — run before swapping one filter for
    * the other, because raw percent agreement (po) flatters whenever
    * both gates mostly say "keep". The confusion cells ride as exact
    * longs; κ is computed in the denominator-cleared exact form
    * (n·(a₁₁+a₀₀) − E) / (n² − E). One doc_id equi-join between the
    * two narrow score maps, one map-side-combined roll-up, one row.
    */
  private val kappaQ = Q(
    "q_ml_kappa",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val model = TextAnalysis.modelQuality(docs)
        .select($"doc_id", ($"logit_scaled" >= 0).cast("long").as("model_keep"))
      val rule = TextAnalysis.gopherFlags(docs, nStop = 8)
        .select($"doc_id", $"keep".as("rule_keep"))
      MlEval.agreement(model.join(rule, "doc_id"), "model_keep", "rule_keep")
    },
    Some(s"""$logitCtes,
            |gw AS (SELECT doc_id, length(text) AS chars, string_split(text, ' ') AS ws FROM documents),
            |top8 AS (
            |  SELECT word FROM (
            |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
            |  GROUP BY word ORDER BY count(*) DESC, word LIMIT 8),
            |stops AS (SELECT list(word) AS stoplist FROM top8),
            |gm AS (
            |  SELECT doc_id,
            |         CAST(len(ws) AS BIGINT) AS n_words,
            |         round((chars - (len(ws) - 1)) * 1.0 / len(ws), 4) AS mean_word_len,
            |         round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(ws), 4) AS alpha_ratio,
            |         CAST(len(list_intersect(list_distinct(ws), stoplist)) AS BIGINT) AS n_stop
            |  FROM gw, stops),
            |g AS (
            |  SELECT doc_id,
            |         CAST(n_words BETWEEN 50 AND 100000
            |              AND mean_word_len BETWEEN 3 AND 10
            |              AND alpha_ratio >= 0.8
            |              AND n_stop >= 2 AS BIGINT) AS b
            |  FROM gm),
            |j AS (SELECT CASE WHEN l.logit >= 0 THEN 1 ELSE 0 END AS a, g.b AS b
            |      FROM l JOIN g USING (doc_id)),
            |cells AS (SELECT CAST(count(*) AS HUGEINT) AS n,
            |                 CAST(sum(a * b) AS HUGEINT) AS a11,
            |                 CAST(sum(a * (1 - b)) AS HUGEINT) AS a10,
            |                 CAST(sum((1 - a) * b) AS HUGEINT) AS a01,
            |                 CAST(sum((1 - a) * (1 - b)) AS HUGEINT) AS a00
            |          FROM j)
            |SELECT CAST(n AS BIGINT) AS n,
            |       CAST(a11 AS BIGINT) AS both_keep, CAST(a10 AS BIGINT) AS only_a,
            |       CAST(a01 AS BIGINT) AS only_b, CAST(a00 AS BIGINT) AS both_drop,
            |       round(CAST(a11 + a00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
            |       CASE WHEN n * n - ((a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00)) = 0 THEN NULL ELSE
            |         round(CAST(n * (a11 + a00) - ((a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00)) AS DOUBLE) /
            |               CAST(n * n - ((a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00)) AS DOUBLE), 6) END AS kappa
            |FROM cells""".stripMargin),
  )

  /** McNemar asymmetry + Matthews correlation between the same two
    * gates as q_ml_kappa — kappa answers "do they agree", this answers
    * "when they disagree, is it one-sided" (the Edwards-corrected χ²
    * on the discordant cells, clamped so b = c reads 0) plus the
    * marginal-robust MCC. Same one-join one-rollup shape; MCC's
    * denominator is two √ factors so each exact product stays ≤ n².
    */
  private val mcnemarQ = Q(
    "q_ml_mcnemar",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val model = TextAnalysis.modelQuality(docs)
        .select($"doc_id", ($"logit_scaled" >= 0).cast("long").as("model_keep"))
      val rule = TextAnalysis.gopherFlags(docs, nStop = 8)
        .select($"doc_id", $"keep".as("rule_keep"))
      MlEval.mcnemar(model.join(rule, "doc_id"), "model_keep", "rule_keep")
    },
    Some(s"""$logitCtes,
            |gw AS (SELECT doc_id, length(text) AS chars, string_split(text, ' ') AS ws FROM documents),
            |top8 AS (
            |  SELECT word FROM (
            |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
            |  GROUP BY word ORDER BY count(*) DESC, word LIMIT 8),
            |stops AS (SELECT list(word) AS stoplist FROM top8),
            |gm AS (
            |  SELECT doc_id,
            |         CAST(len(ws) AS BIGINT) AS n_words,
            |         round((chars - (len(ws) - 1)) * 1.0 / len(ws), 4) AS mean_word_len,
            |         round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(ws), 4) AS alpha_ratio,
            |         CAST(len(list_intersect(list_distinct(ws), stoplist)) AS BIGINT) AS n_stop
            |  FROM gw, stops),
            |g AS (
            |  SELECT doc_id,
            |         CAST(n_words BETWEEN 50 AND 100000
            |              AND mean_word_len BETWEEN 3 AND 10
            |              AND alpha_ratio >= 0.8
            |              AND n_stop >= 2 AS BIGINT) AS b
            |  FROM gm),
            |j AS (SELECT CASE WHEN l.logit >= 0 THEN 1 ELSE 0 END AS a, g.b AS b
            |      FROM l JOIN g USING (doc_id)),
            |cells AS (SELECT CAST(count(*) AS HUGEINT) AS n,
            |                 CAST(sum(a * b) AS HUGEINT) AS a11,
            |                 CAST(sum(a * (1 - b)) AS HUGEINT) AS a10,
            |                 CAST(sum((1 - a) * b) AS HUGEINT) AS a01,
            |                 CAST(sum((1 - a) * (1 - b)) AS HUGEINT) AS a00
            |          FROM j),
            |dev AS (SELECT *, GREATEST(ABS(a10 - a01) - 1, 0) AS d FROM cells)
            |SELECT CAST(n AS BIGINT) AS n,
            |       CAST(a10 AS BIGINT) AS only_a, CAST(a01 AS BIGINT) AS only_b,
            |       CASE WHEN a10 + a01 = 0 THEN NULL ELSE
            |         round(CAST(d * d AS DOUBLE) / CAST(a10 + a01 AS DOUBLE), 6) END AS mcnemar_chi2,
            |       CASE WHEN (a11 + a10) * (a11 + a01) = 0 OR (a00 + a10) * (a00 + a01) = 0 THEN NULL ELSE
            |         round(CAST(a11 * a00 - a10 * a01 AS DOUBLE) /
            |               (sqrt(CAST((a11 + a10) * (a11 + a01) AS DOUBLE)) *
            |                sqrt(CAST((a00 + a10) * (a00 + a01) AS DOUBLE))), 6) END AS mcc
            |FROM dev""".stripMargin),
  )

  /** Expected / maximum calibration error of the quality logit — the
    * single-number companion to q_ml_calibration's table. The ECE
    * numerator is an exact integer (the per-bin n cancels), emitted as
    * `ece_num` so the gate pins the statistic; MCE is floor-quantized
    * to ppm. One bounded histogram aggregation + a 1-row roll-up.
    */
  private val eceQ = Q(
    "q_ml_ece",
    (s, dir) => {
      import s.implicits._
      val scored = TextAnalysis
        .modelQuality(Tables(s, dir).documents, keep = Seq("lang"))
        .select($"logit_scaled", ($"lang" === "en").cast("long").as("lbl"))
      MlEval.ece(scored, "logit_scaled", "lbl", binWidth = 500L)
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
            |  SELECT bin, CAST(count(*) AS BIGINT) AS nb,
            |         CAST(sum(lbl) AS BIGINT) AS pos,
            |         CAST(sum(CAST(score_ppm AS HUGEINT)) AS HUGEINT) AS sppm
            |  FROM p GROUP BY bin
            |),
            |d AS (SELECT nb, ABS(1000000 * CAST(pos AS HUGEINT) - sppm) AS dev FROM g),
            |a AS (
            |  SELECT CAST(sum(nb) AS BIGINT) AS n,
            |         CAST(count(*) AS BIGINT) AS n_bins,
            |         CAST(sum(dev) AS BIGINT) AS ece_num,
            |         CAST(max(dev // nb) AS BIGINT) AS mce_ppm
            |  FROM d
            |)
            |SELECT n, n_bins, ece_num, mce_ppm,
            |       round(CAST(ece_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6) AS ece
            |FROM a""".stripMargin),
  )

  /** Brier score with Murphy's reliability/resolution/uncertainty
    * decomposition over the calibration bins — brier and uncertainty
    * exact to the terminal division, the binned terms on ppm-floored
    * bin means so no double ever accumulates. One corpus histogram
    * pass; everything downstream runs on ≤|bins| rows.
    */
  private val brierQ = Q(
    "q_ml_brier",
    (s, dir) => {
      import s.implicits._
      val scored = TextAnalysis
        .modelQuality(Tables(s, dir).documents, keep = Seq("lang"))
        .select($"logit_scaled", ($"lang" === "en").cast("long").as("lbl"))
      MlEval.brier(scored, "logit_scaled", "lbl", binWidth = 500L)
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
            |  SELECT bin, CAST(count(*) AS HUGEINT) AS nb,
            |         CAST(sum(lbl) AS HUGEINT) AS pos,
            |         CAST(sum(CAST(score_ppm AS HUGEINT)) AS HUGEINT) AS sppm,
            |         CAST(sum((1000000 * CAST(lbl AS HUGEINT) - score_ppm) *
            |                  (1000000 * CAST(lbl AS HUGEINT) - score_ppm)) AS HUGEINT) AS sq
            |  FROM p GROUP BY bin
            |),
            |b AS (SELECT *, sppm // nb AS pbar, (1000000 * pos) // nb AS ybar_b FROM g),
            |t AS (SELECT CAST(sum(nb) AS HUGEINT) AS n, CAST(sum(pos) AS HUGEINT) AS p,
            |             CAST(sum(sq) AS HUGEINT) AS sq FROM b),
            |t2 AS (SELECT *, (1000000 * p) // n AS ybar FROM t),
            |rr AS (
            |  SELECT CAST(sum(nb * (pbar - ybar_b) * (pbar - ybar_b)) AS HUGEINT) AS rel_num,
            |         CAST(sum(nb * (ybar_b - ybar) * (ybar_b - ybar)) AS HUGEINT) AS res_num,
            |         CAST(count(*) AS BIGINT) AS n_bins
            |  FROM b, t2
            |)
            |SELECT CAST(t2.n AS BIGINT) AS n, rr.n_bins,
            |       round(CAST(t2.sq AS DOUBLE) / (CAST(t2.n AS DOUBLE) * 1e12), 6) AS brier,
            |       round(CAST(rr.rel_num AS DOUBLE) / (CAST(t2.n AS DOUBLE) * 1e12), 6) AS reliability,
            |       round(CAST(rr.res_num AS DOUBLE) / (CAST(t2.n AS DOUBLE) * 1e12), 6) AS resolution,
            |       round(CAST(t2.p * (t2.n - t2.p) AS DOUBLE) /
            |             (CAST(t2.n AS DOUBLE) * CAST(t2.n AS DOUBLE)), 6) AS uncertainty
            |FROM t2, rr""".stripMargin),
  )

  /** End-to-end operating-point pipeline: score → sweep → pick the
    * argmax-F1 threshold IN-PLAN (no driver round-trip) → apply the
    * gate → per-source audit against the rule gate. This is the
    * sequence a curation team actually runs when swapping the rule
    * filter for the model filter; every stage is already individually
    * oracled (q_text_model_quality, q_ml_pr_curve, q_text_gopher_rules,
    * q_ml_kappa) — the composite pins their composition. The argmax
    * orders by the UNROUNDED F1 (a single IEEE division of exact
    * operands — identical in both engines) with the threshold as
    * tie-break, and rides a 1-row broadcast into the gating pass, so
    * the corpus is scanned twice total (once to sweep, once to gate)
    * and nothing corpus-sized crosses a global window.
    */
  private val pipelineModelEval = Q(
    "q_pipeline_model_eval",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val scored = TextAnalysis
        .modelQuality(docs, keep = Seq("source", "lang"))
        .select($"doc_id", $"source", $"logit_scaled",
          ($"lang" === "en").cast("long").as("lbl"))
      val sweep = MlEval.prCurve(
        scored.select($"logit_scaled", $"lbl"), "logit_scaled", "lbl")
      val nPos = scored.agg(sum($"lbl").cast("long").as("n_pos"))
      val best = sweep
        .crossJoin(broadcast(nPos))
        .select($"thr",
          ((lit(2.0) * $"tp".cast("double")) /
            ($"tp" + $"tp" + $"fp" + ($"n_pos" - $"tp")).cast("double"))
            .as("f1u"))
        .orderBy($"f1u".desc, $"thr")
        .limit(1)
        .select($"thr".as("t_star"))
      val rule = TextAnalysis.gopherFlags(docs, nStop = 8)
        .select($"doc_id", $"keep".cast("long").as("rule_keep"))
      scored
        .crossJoin(broadcast(best))
        .select($"doc_id", $"source", $"t_star",
          ($"logit_scaled" >= $"t_star").cast("long").as("model_keep"))
        .join(rule, "doc_id")
        .groupBy($"source")
        .agg(
          max($"t_star").as("thr"),
          count(lit(1)).as("n_docs"),
          sum($"model_keep").cast("long").as("n_keep_model"),
          sum($"rule_keep").cast("long").as("n_keep_rule"),
          sum($"model_keep" * $"rule_keep").cast("long").as("n_both"))
        .select($"source", $"thr", $"n_docs", $"n_keep_model",
          $"n_keep_rule", $"n_both",
          round($"n_keep_model".cast("double") / $"n_docs".cast("double"), 6)
            .as("keep_rate_model"))
        .orderBy($"source")
    },
    Some(s"""$logitCtes,
            |c AS (SELECT logit AS thr, CAST(sum(lbl) AS BIGINT) AS pos,
            |             CAST(count(*) - sum(lbl) AS BIGINT) AS neg FROM l GROUP BY logit),
            |w AS (SELECT thr, pos, neg,
            |             CAST(sum(pos) OVER (ORDER BY thr DESC ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS tp,
            |             CAST(sum(neg) OVER (ORDER BY thr DESC ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS fp
            |      FROM c),
            |t AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos FROM c),
            |best AS (SELECT thr AS t_star FROM w, t
            |         ORDER BY (2.0 * CAST(tp AS DOUBLE)) /
            |                  CAST(tp + tp + fp + (n_pos - tp) AS DOUBLE) DESC, thr
            |         LIMIT 1),
            |gw AS (SELECT doc_id, length(text) AS chars, string_split(text, ' ') AS ws FROM documents),
            |top8 AS (
            |  SELECT word FROM (
            |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
            |  GROUP BY word ORDER BY count(*) DESC, word LIMIT 8),
            |stops AS (SELECT list(word) AS stoplist FROM top8),
            |gm AS (
            |  SELECT doc_id,
            |         CAST(len(ws) AS BIGINT) AS n_words,
            |         round((chars - (len(ws) - 1)) * 1.0 / len(ws), 4) AS mean_word_len,
            |         round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(ws), 4) AS alpha_ratio,
            |         CAST(len(list_intersect(list_distinct(ws), stoplist)) AS BIGINT) AS n_stop
            |  FROM gw, stops),
            |g AS (
            |  SELECT doc_id,
            |         CAST(n_words BETWEEN 50 AND 100000
            |              AND mean_word_len BETWEEN 3 AND 10
            |              AND alpha_ratio >= 0.8
            |              AND n_stop >= 2 AS BIGINT) AS b
            |  FROM gm),
            |j AS (SELECT l.source,
            |             CASE WHEN l.logit >= best.t_star THEN 1 ELSE 0 END AS mk,
            |             g.b AS rk, best.t_star
            |      FROM l JOIN g USING (doc_id), best)
            |SELECT source, CAST(max(t_star) AS BIGINT) AS thr,
            |       CAST(count(*) AS BIGINT) AS n_docs,
            |       CAST(sum(mk) AS BIGINT) AS n_keep_model,
            |       CAST(sum(rk) AS BIGINT) AS n_keep_rule,
            |       CAST(sum(mk * rk) AS BIGINT) AS n_both,
            |       round(CAST(sum(mk) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS keep_rate_model
            |FROM j GROUP BY source
            |ORDER BY source""".stripMargin),
  )

  private def profileValues: String =
    TextAnalysis.defaultProfile
      .map { case (l, w, wt) => s"('$l', '$w', $wt)" }
      .mkString(", ")

  /** Multi-class confusion summary of the language-ID model
    * (TextAnalysis.langId, default profile) against the `lang` label:
    * per-class support/tp/fp/fn plus one-vs-rest precision/recall/F1
    * — the per-language error readout a curation team checks before
    * trusting langid-gated corpus splits. Docs the profile never hits
    * predict 'und', so every document is scored exactly once. The
    * corpus-sized work is langid's own broadcast profile join plus
    * ONE cell aggregation; everything downstream runs on the
    * ≤|classes|² cell table.
    */
  private val confusionQ = Q(
    "q_ml_confusion",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val pred = TextAnalysis.langId(docs, TextAnalysis.defaultProfile)
        .select($"doc_id", $"pred_lang")
      val pairs = docs.select($"doc_id", $"lang")
        .join(pred, Seq("doc_id"), "left")
        .select($"lang".as("actual"),
          coalesce($"pred_lang", lit("und")).as("pred"))
      MlEval.confusion(pairs, "actual", "pred").orderBy($"cls")
    },
    Some(s"""WITH prof(p_lang, p_word, p_weight) AS (VALUES $profileValues),
            |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
            |scores AS (
            |  SELECT doc_id, p_lang, CAST(sum(p_weight) AS BIGINT) AS score
            |  FROM words JOIN prof ON w = p_word
            |  GROUP BY doc_id, p_lang),
            |mx AS (
            |  SELECT doc_id, p_lang, score, max(score) OVER (PARTITION BY doc_id) AS m
            |  FROM scores),
            |pl AS (SELECT doc_id, min(p_lang) AS pred_lang FROM mx WHERE score = m GROUP BY doc_id),
            |pairs AS (
            |  SELECT d.lang AS a, coalesce(pl.pred_lang, 'und') AS p
            |  FROM documents d LEFT JOIN pl USING (doc_id)),
            |cells AS (SELECT a, p, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY a, p),
            |act AS (SELECT a AS cls, CAST(sum(c) AS BIGINT) AS support FROM cells GROUP BY a),
            |prd AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS pred_n FROM cells GROUP BY p),
            |diag AS (SELECT a AS cls, c AS tp0 FROM cells WHERE a = p),
            |j AS (
            |  SELECT coalesce(act.cls, prd.cls) AS cls,
            |         coalesce(support, 0) AS support, coalesce(pred_n, 0) AS pred_n
            |  FROM act FULL OUTER JOIN prd ON act.cls = prd.cls),
            |f AS (
            |  SELECT j.cls, j.support, coalesce(d.tp0, 0) AS tp, j.pred_n
            |  FROM j LEFT JOIN diag d ON j.cls = d.cls)
            |SELECT cls, CAST(support AS BIGINT) AS support, CAST(tp AS BIGINT) AS tp,
            |       CAST(pred_n - tp AS BIGINT) AS fp, CAST(support - tp AS BIGINT) AS fn,
            |       CASE WHEN pred_n = 0 THEN NULL ELSE
            |         round(CAST(tp AS DOUBLE) / CAST(pred_n AS DOUBLE), 6) END AS precision,
            |       CASE WHEN support = 0 THEN NULL ELSE
            |         round(CAST(tp AS DOUBLE) / CAST(support AS DOUBLE), 6) END AS recall,
            |       CASE WHEN pred_n + support = 0 THEN NULL ELSE
            |         round(2.0 * CAST(tp AS DOUBLE) / CAST(pred_n + support AS DOUBLE), 6) END AS f1
            |FROM f
            |ORDER BY cls""".stripMargin),
  )

  /** The Poisson-weight CASE chain and resample CTEs shared by the two
    * bootstrap oracles: weight = #{thresholds ≤ u}, u = fnv63(id:b) —
    * the identical integer literals `MlEval.poissonThresholds` compiles
    * into the Spark plan, so both engines draw the same resamples.
    */
  private def poissonWeightSql: String =
    graft.operators.MlEval.poissonThresholds
      .map(t => s"CASE WHEN u >= $t THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Per-source gate accuracy with a deterministic Poisson(1)
    * bootstrap 95% CI (`MlEval.bootstrapAcc`): does the quality
    * model's en-separation hold up once resampling noise is priced
    * in, per domain. The oracle replays the identical resamples —
    * same fnv63 coins, same threshold literals, same rank-based
    * percentile — as straight SQL.
    */
  private val bootstrapCiQ = Q(
    "q_ml_bootstrap_ci",
    (s, dir) => {
      import s.implicits._
      val scored = TextAnalysis
        .modelQuality(Tables(s, dir).documents, keep = Seq("source", "lang"))
        .select($"doc_id", $"source",
          (($"logit_scaled" >= 0) === ($"lang" === "en")).cast("long")
            .as("correct"))
      MlEval.bootstrapAcc(scored, "source", "doc_id", "correct", reps = 200)
        .orderBy($"source")
    },
    Some(s"""$logitCtes,
            |c AS (SELECT doc_id, source,
            |             CAST((logit >= 0) = (lbl = 1) AS BIGINT) AS cc
            |      FROM l),
            |rep AS (SELECT doc_id, source, cc, CAST(rb.b AS BIGINT) AS b
            |        FROM c, range(1, 201) rb(b)),
            |h AS (SELECT source, b, cc, ${Relational.fnv63Sql(
              "CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")} AS u
            |      FROM rep),
            |w AS (SELECT source, b, cc, $poissonWeightSql AS w FROM h),
            |a AS (SELECT source, b, sum(w * cc) AS ks, sum(w) AS ns
            |      FROM w GROUP BY source, b HAVING sum(w) > 0),
            |acc AS (SELECT source, b,
            |               CAST((1000000 * ks) // ns AS BIGINT) AS acc_b
            |        FROM a),
            |r AS (SELECT source, b, acc_b,
            |             row_number() OVER (PARTITION BY source ORDER BY acc_b, b) AS rn,
            |             count(*) OVER (PARTITION BY source) AS m
            |      FROM acc),
            |ci AS (SELECT source,
            |              max(CASE WHEN rn = greatest((m * 25) // 1000, 1) THEN acc_b END) AS ci_lo_ppm,
            |              max(CASE WHEN rn = m - (m * 25) // 1000 THEN acc_b END) AS ci_hi_ppm,
            |              CAST(max(m) AS BIGINT) AS reps_used
            |       FROM r GROUP BY source),
            |p AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            |             CAST((1000000 * sum(cc)) // count(*) AS BIGINT) AS acc_ppm
            |      FROM c GROUP BY source)
            |SELECT p.source, n, acc_ppm, ci_lo_ppm, ci_hi_ppm, reps_used
            |FROM p JOIN ci USING (source)
            |ORDER BY source""".stripMargin),
  )

  /** Paired-bootstrap accuracy delta, model gate vs gopher rule gate
    * (`MlEval.bootstrapDelta`): each replicate reweights the corpus
    * ONCE and scores both gates on the identical resample, so the CI
    * on the difference is the paired one — the per-source verdict
    * "the model beats the rule by 40±15 points" with a significance
    * bit the mcnemar/kappa gates can't price per domain.
    */
  private val bootstrapDeltaQ = Q(
    "q_ml_bootstrap_delta",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
      val model = TextAnalysis
        .modelQuality(docs, keep = Seq("source", "lang"))
        .select($"doc_id", $"source", ($"lang" === "en").cast("long").as("lbl"),
          ($"logit_scaled" >= 0).cast("long").as("mk"))
      val rule = TextAnalysis.gopherFlags(docs, nStop = 8)
        .select($"doc_id", $"keep".cast("long").as("rk"))
      val paired = model.join(rule, "doc_id")
        .select($"doc_id", $"source",
          ($"mk" === $"lbl").cast("long").as("ca"),
          ($"rk" === $"lbl").cast("long").as("cb"))
      MlEval.bootstrapDelta(paired, "source", "doc_id", "ca", "cb", reps = 200)
        .orderBy($"source")
    },
    Some(s"""$logitCtes,
            |gw AS (SELECT doc_id, length(text) AS chars, string_split(text, ' ') AS ws FROM documents),
            |top8 AS (
            |  SELECT word FROM (
            |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
            |  GROUP BY word ORDER BY count(*) DESC, word LIMIT 8),
            |stops AS (SELECT list(word) AS stoplist FROM top8),
            |gm AS (
            |  SELECT doc_id,
            |         CAST(len(ws) AS BIGINT) AS n_words,
            |         round((chars - (len(ws) - 1)) * 1.0 / len(ws), 4) AS mean_word_len,
            |         round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(ws), 4) AS alpha_ratio,
            |         CAST(len(list_intersect(list_distinct(ws), stoplist)) AS BIGINT) AS n_stop
            |  FROM gw, stops),
            |gg AS (
            |  SELECT doc_id,
            |         CAST(n_words BETWEEN 50 AND 100000
            |              AND mean_word_len BETWEEN 3 AND 10
            |              AND alpha_ratio >= 0.8
            |              AND n_stop >= 2 AS BIGINT) AS rk
            |  FROM gm),
            |c AS (SELECT l.doc_id, l.source,
            |             CAST((l.logit >= 0) = (l.lbl = 1) AS BIGINT) AS ca,
            |             CAST((gg.rk = l.lbl) AS BIGINT) AS cb
            |      FROM l JOIN gg USING (doc_id)),
            |rep AS (SELECT doc_id, source, ca, cb, CAST(rb.b AS BIGINT) AS b
            |        FROM c, range(1, 201) rb(b)),
            |h AS (SELECT source, b, ca, cb, ${Relational.fnv63Sql(
              "CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")} AS u
            |      FROM rep),
            |w AS (SELECT source, b, ca, cb, $poissonWeightSql AS w FROM h),
            |a AS (SELECT source, b, sum(w * ca) AS ka, sum(w * cb) AS kb, sum(w) AS ns
            |      FROM w GROUP BY source, b HAVING sum(w) > 0),
            |d AS (SELECT source, b,
            |             CAST((1000000 * ka) // ns - (1000000 * kb) // ns AS BIGINT) AS d_b
            |      FROM a),
            |r AS (SELECT source, b, d_b,
            |             row_number() OVER (PARTITION BY source ORDER BY d_b, b) AS rn,
            |             count(*) OVER (PARTITION BY source) AS m
            |      FROM d),
            |ci AS (SELECT source,
            |              max(CASE WHEN rn = greatest((m * 25) // 1000, 1) THEN d_b END) AS ci_lo_ppm,
            |              max(CASE WHEN rn = m - (m * 25) // 1000 THEN d_b END) AS ci_hi_ppm
            |       FROM r GROUP BY source),
            |p AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            |             CAST((1000000 * sum(ca)) // count(*)
            |                  - (1000000 * sum(cb)) // count(*) AS BIGINT) AS delta_ppm
            |      FROM c GROUP BY source)
            |SELECT p.source, n, delta_ppm, ci_lo_ppm, ci_hi_ppm,
            |       CAST(ci_lo_ppm > 0 OR ci_hi_ppm < 0 AS BIGINT) AS significant
            |FROM p JOIN ci USING (source)
            |ORDER BY source""".stripMargin),
  )

  /** Per-source AUC with a deterministic Poisson-bootstrap 95% CI
    * (`MlEval.bootstrapAuc`): the separation number with its sampling
    * noise priced in — "source X separates at 0.91 ± 0.03" instead of
    * a bare point. The weights multiply the per-replicate score
    * HISTOGRAM, so each of the 200 Mann–Whitney sweeps runs on the
    * logit support, never corpus×reps rows. The oracle replays the
    * identical resamples (same fnv63 coins, same Poisson thresholds)
    * through the identical histogram sweep in HUGEINT, and the same
    * rank-based percentile — exact ppm integers on both sides.
    */
  private val bootstrapAucQ = Q(
    "q_ml_auc_ci",
    (s, dir) => {
      import s.implicits._
      val scored = TextAnalysis
        .modelQuality(Tables(s, dir).documents, keep = Seq("source", "lang"))
        .select($"doc_id", $"source", $"logit_scaled",
          ($"lang" === "en").cast("long").as("lbl"))
      MlEval.bootstrapAuc(scored, "source", "doc_id", "logit_scaled", "lbl",
        reps = 200)
        .orderBy($"source")
    },
    Some(s"""$logitCtes,
            |rep AS (SELECT doc_id, source, logit AS s, lbl, CAST(rb.b AS BIGINT) AS b
            |        FROM l, range(1, 201) rb(b)),
            |hsh AS (SELECT source, b, s, lbl, ${Relational.fnv63Sql(
              "CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")} AS u
            |        FROM rep),
            |wt AS (SELECT source, b, s, lbl, $poissonWeightSql AS w FROM hsh),
            |hist AS (SELECT source, b, s,
            |                CAST(sum(w * lbl) AS HUGEINT) AS pos,
            |                CAST(sum(w * (1 - lbl)) AS HUGEINT) AS neg
            |         FROM wt GROUP BY 1, 2, 3),
            |cum AS (SELECT source, b, pos, neg,
            |               sum(neg) OVER (PARTITION BY source, b ORDER BY s
            |                 ROWS UNBOUNDED PRECEDING) - neg AS cumneg
            |        FROM hist),
            |pr AS (SELECT source, b, sum(pos) AS np, sum(neg) AS nn,
            |              sum(pos * (2 * cumneg + neg)) AS u2
            |       FROM cum GROUP BY 1, 2),
            |ab AS (SELECT source, b,
            |              CAST((1000000 * u2) // (2 * np * nn) AS BIGINT) AS auc_b_ppm
            |       FROM pr WHERE np > 0 AND nn > 0),
            |r AS (SELECT source, b, auc_b_ppm,
            |             row_number() OVER (PARTITION BY source ORDER BY auc_b_ppm, b) AS rn,
            |             count(*) OVER (PARTITION BY source) AS m
            |      FROM ab),
            |ci AS (SELECT source,
            |              max(CASE WHEN rn = greatest((m * 25) // 1000, 1) THEN auc_b_ppm END) AS ci_lo_ppm,
            |              max(CASE WHEN rn = m - (m * 25) // 1000 THEN auc_b_ppm END) AS ci_hi_ppm,
            |              CAST(max(m) AS BIGINT) AS reps_used
            |       FROM r GROUP BY source),
            |c AS (SELECT source, logit AS s, CAST(sum(lbl) AS HUGEINT) AS pos,
            |             CAST(count(*) - sum(lbl) AS HUGEINT) AS neg
            |      FROM l GROUP BY 1, 2),
            |pw AS (SELECT source, pos, neg,
            |              sum(neg) OVER (PARTITION BY source ORDER BY s
            |                ROWS UNBOUNDED PRECEDING) - neg AS cumneg
            |       FROM c),
            |pa AS (SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
            |              CAST(sum(neg) AS BIGINT) AS n_neg,
            |              sum(pos * (2 * cumneg + neg)) AS u2
            |       FROM pw GROUP BY source)
            |SELECT pa.source, n_pos, n_neg,
            |       CAST((1000000 * u2) //
            |            (2 * CAST(n_pos AS HUGEINT) * CAST(n_neg AS HUGEINT)) AS BIGINT) AS auc_ppm,
            |       ci_lo_ppm, ci_hi_ppm, reps_used
            |FROM pa JOIN ci USING (source)
            |WHERE n_pos > 0 AND n_neg > 0
            |ORDER BY source""".stripMargin),
  )

  def all: Seq[Q] =
    Seq(linearProbe, aucQ, calibrationQ, prCurveQ, kappaQ, confusionQ,
      mcnemarQ, eceQ, brierQ, pipelineModelEval, bootstrapCiQ, bootstrapDeltaQ,
      bootstrapAucQ)
}
