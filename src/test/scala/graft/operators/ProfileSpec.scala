package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column-profiler semantics: null accounting, distinct-excludes-null,
  * and native-type min/max (not lexicographic over strings).
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profiles counts, nulls, distincts, and native min/max per column") {
    val df = Seq[(Option[Long], Option[String])](
      (Some(9L), Some("b")), (Some(10L), Some("a")),
      (Some(9L), None), (None, Some("a")),
    ).toDF("k", "s")
    val out = Profile.profile(df, Seq("k", "s"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))))
      .toMap
    // k: 4 rows, 1 null, distinct {9,10} = 2; min 9 — NATIVE numeric
    // ordering ("10" < "9" lexicographically, the trap the profiler
    // must not fall into)
    assert(out("k") == ((4L, 1L, 2L, "9", "10")))
    // s: distinct excludes the null, min/max over {a, b}
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("dotted column names resolve exactly (no nested-field parse) " +
    "and duplicates profile once") {
    val df = Seq((1L, "x"), (2L, "y"), (2L, null: String))
      .toDF("id.v2", "s")
    val out = Profile.profile(df, Seq("id.v2", "s", "s")).collect()
    assert(out.length == 2, "duplicate column request must profile once")
    val dotted = out.find(_.getString(0) == "id.v2").get
    assert((dotted.getLong(1), dotted.getLong(2), dotted.getLong(3),
      dotted.getString(4), dotted.getString(5)) == ((3L, 0L, 2L, "1", "2")))
  }

  test("grouped profiler: per-group rows; each group's sketch equals " +
    "an ungrouped profile of that group alone") {
    val df = Seq(
      ("web", Some(1L), "x"), ("web", Some(2L), "y"), ("web", None, "y"),
      ("pdf", Some(7L), "z"),
    ).toDF("src", "k", "s")
    val by = Profile.profileHllBy(df, "src", Seq("k", "s")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    assert(by.keySet == Set(("web", "k"), ("web", "s"), ("pdf", "k"), ("pdf", "s")))
    val webAlone = Profile.profileHll(df.filter($"src" === "web"), Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(by(("web", "k")) == webAlone("k"))
    assert(by(("web", "s")) == webAlone("s"))
    // null accounting inside a group
    assert(by(("web", "k")).take(2) == Seq(3L, 1L)) // n_rows, n_null
    assert(by(("pdf", "k")).take(2) == Seq(1L, 0L))
  }

  test("rejects unknown columns loudly") {
    val df = Seq((1L, "x")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("robust outliers: exact quartiles and both Tukey fences") {
    // group A: values 1..11 plus a planted 1000 (high) and -1000 (low).
    // order statistics over 13 values: q1 = v s.t. cum ≥ ⌈13/4⌉=4 → 3,
    // med → 6, q3 = cum ≥ ⌈39/4⌉=10 → 9; IQR 6 → fences [-6, 18].
    val df = ((1 to 11).map(v => (v.toLong, "A", v.toLong)) ++
      Seq((100L, "A", 1000L), (101L, "A", -1000L), (200L, "B", 5L)))
      .toDF("doc_id", "g", "v")
    val out = Profile.robustOutliers(df, "g", "doc_id", "v")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))))
      .toMap
    assert(out.keySet == Set(100L, 101L))
    assert(out(100L) == ((1000L, 3L, 6L, 9L, "high")))
    assert(out(101L) == ((-1000L, 3L, 6L, 9L, "low")))
  }

  test("robust outliers: a constant group has zero IQR and flags nothing") {
    val df = Seq((1L, "C", 7L), (2L, "C", 7L), (3L, "C", 7L))
      .toDF("doc_id", "g", "v")
    assert(Profile.robustOutliers(df, "g", "doc_id", "v").count() == 0)
  }
}
