package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextDedup.normalized: the exact folding rules fuzzy-exact dedup
  * hashes on.
  */
class NormalizedTextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextDedup.normalized($"t")).as[String].head()
  }

  test("case, punctuation, and whitespace variants fold to one form") {
    assert(norm("Hello,   World!!") == "hello world")
    assert(norm("  hello world ") == "hello world")
    assert(norm("HELLO-WORLD") == "hello world")
    assert(norm("hello world") == "hello world")
  }

  test("punctuation becomes a separator, never a concatenation") {
    assert(norm("foo!bar") == "foo bar")
  }

  test("digits survive") {
    assert(norm("Top 10 LISTS!") == "top 10 lists")
  }

  test("all-punctuation input normalizes to empty") {
    assert(norm("?!... --") == "")
  }
}
