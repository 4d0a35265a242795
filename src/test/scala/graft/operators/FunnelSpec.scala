package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Funnel semantics: strict ordering between stages, chain breaks,
  * out-of-order histories, and input validation.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  private def run(evs: Seq[(Long, Timestamp, String)]): Map[Long, (Option[Timestamp], Option[Timestamp], Int)] =
    Funnel.funnel(evs.toDF("user_id", "ts", "event_type"), Seq("a", "b"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), r.getInt(3))))
      .toMap

  test("stage 2 must be strictly after stage 1; earliest qualifying wins") {
    val out = run(Seq(
      (1L, ts(5), "a"), (1L, ts(3), "b"), // b before a: doesn't count
      (1L, ts(8), "b"), (1L, ts(9), "b"), // earliest after a wins
      (2L, ts(1), "a"),                   // never converts
      (3L, ts(2), "b"),                   // never enters the funnel
    ))
    assert(out == Map(
      1L -> ((Some(ts(5)), Some(ts(8)), 2)),
      2L -> ((Some(ts(1)), None, 1)),
    ))
  }

  test("same-timestamp stage-2 event does not qualify (strict >)") {
    val out = run(Seq((1L, ts(4), "a"), (1L, ts(4), "b")))
    assert(out(1L) == ((Some(ts(4)), None, 1)))
  }

  test("duplicate stages are rejected") {
    val e = intercept[IllegalArgumentException] {
      Funnel.funnel(Seq((1L, ts(0), "a")).toDF("user_id", "ts", "event_type"),
        Seq("a", "a"))
    }
    assert(e.getMessage.contains("duplicate"))
  }
}
