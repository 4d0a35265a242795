package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD2 interval semantics: same-state runs collapse, changes open
  * versions, valid_to chains to the next valid_from (NULL when open),
  * ties break on the order column, and the whole thing plans as ONE
  * exchange.
  */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def build(rows: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    Scd.intervals(
      rows.map { case (k, st, t, o) => (k, st, ts(t), o) }
        .toDF("key", "state", "ts", "ord"),
      "key", "state", "ts", "ord")
  }

  test("runs collapse, changes version, valid_to chains, open end is null") {
    val got = build(Seq(
      (1L, "A", 1L, 1L), (1L, "A", 2L, 2L), (1L, "B", 3L, 3L), (1L, "A", 4L, 4L),
    )).collect().sortBy(_.getLong(1))
    assert(got.map(r => (r.getLong(1), r.getString(2), r.getTimestamp(3),
      Option(r.getTimestamp(4)), r.getLong(5))).toSeq == Seq(
      (1L, "A", ts(1), Some(ts(3)), 2L),
      (2L, "B", ts(3), Some(ts(4)), 1L),
      (3L, "A", ts(4), None, 1L),
    ))
  }

  test("equal timestamps order by the tie-break column") {
    // at t=5 both B(ord 2) then A(ord 3): B comes first, then A opens v2
    val got = build(Seq(
      (1L, "B", 5L, 2L), (1L, "A", 5L, 3L),
    )).collect().sortBy(_.getLong(1))
    assert(got.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, "B"), (2L, "A")))
  }

  test("keys are independent") {
    val got = build(Seq(
      (1L, "A", 1L, 1L), (2L, "A", 1L, 2L), (2L, "B", 2L, 3L),
    )).collect()
    assert(got.count(_.getLong(0) == 1L) == 1)
    assert(got.count(_.getLong(0) == 2L) == 2)
  }

  test("the whole interval build is ONE exchange on the key") {
    import spark.implicits._
    val df = Seq((1L, "A", ts(1), 1L)).toDF("key", "state", "ts", "ord")
    val plan = Scd.intervals(df, "key", "state", "ts", "ord")
      .queryExecution.executedPlan.toString
    val n = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(n == 1, s"expected exactly one exchange:\n$plan")
  }
}
