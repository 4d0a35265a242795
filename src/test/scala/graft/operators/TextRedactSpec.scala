package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Redaction semantics: rule order, sequential counting, and the
  * narrow-map plan shape.
  */
class TextRedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String): (Long, Long, Long, Long, String) = {
    val r = TextAnalysis.redact(Seq((1L, text)).toDF("doc_id", "text")).collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
  }

  test("each default pattern redacts and counts") {
    val (e, s, p, i, t) =
      one("mail a.b+c@x-y.co ssn 123-45-6789 tel +1 (415) 555-0000 ip 10.0.0.1 .")
    assert((e, s, p, i) == (1L, 1L, 1L, 1L))
    assert(t == "mail <EMAIL> ssn <SSN> tel <PHONE> ip <IP> .")
  }

  test("SSN is consumed by the ssn rule before the looser phone rule sees it") {
    val (e, s, p, _, t) = one("id 123-45-6789 only")
    assert((e, s, p) == (0L, 1L, 0L))
    assert(t == "id <SSN> only")
  }

  test("counts are per-occurrence, replacement is global") {
    val (e, _, _, _, t) = one("a@b.com then c@d.org")
    assert(e == 2L)
    assert(t == "<EMAIL> then <EMAIL>")
  }

  test("clean text passes through untouched") {
    val (e, s, p, i, t) = one("no pii here at all")
    assert((e, s, p, i) == (0L, 0L, 0L, 0L))
    assert(t == "no pii here at all")
  }

  test("redact is a pure narrow map: zero exchanges") {
    val df = TextAnalysis.redact(Seq((1L, "x@y.io")).toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redact grew a shuffle:\n$plan")
  }
}
