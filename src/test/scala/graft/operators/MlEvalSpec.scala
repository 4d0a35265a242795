package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Closed-form pins for the model-eval primitives: OLS against known
  * lines, midrank AUC against hand-computed Mann–Whitney U, the
  * calibration bin/ppm arithmetic against exact floor divisions
  * (including the negative-logit side where truncation ≠ floor).
  */
class MlEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("linearProbe recovers an exact line with r2 = 1") {
    import spark.implicits._
    val df = Seq(("g", 1L, 3L), ("g", 2L, 5L), ("g", 3L, 7L))
      .toDF("src", "x", "y")
    val r = MlEval.linearProbe(df, "src", "x", "y").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n") == 3L)
    assert(row.getAs[Double]("slope") == 2.0)
    assert(row.getAs[Double]("intercept") == 1.0)
    assert(row.getAs[Double]("r2") == 1.0)
  }

  test("linearProbe: zero x-variance group yields NULL fit, not a blow-up") {
    import spark.implicits._
    val df = Seq(("g", 2L, 3L), ("g", 2L, 9L)).toDF("src", "x", "y")
    val row = MlEval.linearProbe(df, "src", "x", "y").collect().head
    assert(row.isNullAt(row.fieldIndex("slope")))
    assert(row.isNullAt(row.fieldIndex("intercept")))
    assert(row.isNullAt(row.fieldIndex("r2")))
  }

  test("auc: perfect separation is 1.0, anti-separation is 0.0") {
    import spark.implicits._
    val good = Seq(("g", 10L, 1L), ("g", 9L, 1L), ("g", 2L, 0L), ("g", 1L, 0L))
      .toDF("src", "s", "lbl")
    val g = MlEval.auc(good, "src", "s", "lbl").collect().head
    assert(g.getAs[Double]("auc") == 1.0 && g.getAs[Long]("u2") == 8L)
    val bad = good.withColumn("lbl", lit(1L) - col("lbl"))
    val b = MlEval.auc(bad, "src", "s", "lbl").collect().head
    assert(b.getAs[Double]("auc") == 0.0 && b.getAs[Long]("u2") == 0L)
  }

  test("auc: ties get midrank treatment (hand-computed U = 1.5)") {
    import spark.implicits._
    // pos at score 1 (tied with the only neg) contributes 0.5,
    // pos at score 2 contributes 1 → U = 1.5, AUC = 1.5 / (2·1)
    val df = Seq(("g", 1L, 0L), ("g", 1L, 1L), ("g", 2L, 1L))
      .toDF("src", "s", "lbl")
    val r = MlEval.auc(df, "src", "s", "lbl").collect().head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("u2") == 3L)
    assert(r.getAs[Double]("auc") == 0.75)
  }

  test("auc: one-class group yields NULL") {
    import spark.implicits._
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("src", "s", "lbl")
    val r = MlEval.auc(df, "src", "s", "lbl").collect().head
    assert(r.isNullAt(r.fieldIndex("auc")) && r.getAs[Long]("n_neg") == 0L)
  }

  test("calibration: exact ppm sigmoid and floor bins on both signs") {
    import spark.implicits._
    // l = -250: bin floor(-250/500) = -1 (truncation would give 0);
    //   score = 500000 + floor(500000·(-250)/1250) = 400000 exactly.
    // l = 750: bin 1; score = 500000 + floor(375e6/1750) = 714285.
    val df = Seq((-250L, 0L), (750L, 1L)).toDF("logit", "lbl")
    val r = MlEval.calibration(df, "logit", "lbl", binWidth = 500L)
      .orderBy("bin").collect()
    assert(r.map(_.getAs[Long]("bin")).toSeq == Seq(-1L, 1L))
    assert(r(0).getAs[Double]("mean_pred_ppm") == 400000.0)
    assert(r(0).getAs[Double]("pos_rate") == 0.0)
    assert(r(1).getAs[Double]("mean_pred_ppm") == 714285.0)
    assert(r(1).getAs[Double]("pos_rate") == 1.0)
  }

  test("calibration mean is an exact ratio, not a double accumulation") {
    import spark.implicits._
    // two logits in one bin: l=0 → 500000; l=100 → 500000+floor(5e7/1100)
    // = 545454; mean = 1045454/2 = 522727.0 exactly
    val df = Seq((0L, 1L), (100L, 0L)).toDF("logit", "lbl")
    val r = MlEval.calibration(df, "logit", "lbl").collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("mean_pred_ppm") == 522727.0)
    assert(r.getAs[Double]("pos_rate") == 0.5)
  }
}
