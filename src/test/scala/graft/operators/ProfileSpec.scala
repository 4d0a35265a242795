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

  test("rejects unknown columns loudly") {
    val df = Seq((1L, "x")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
