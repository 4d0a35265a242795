package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TF-IDF keyword extraction: hand-computed scores on a toy corpus,
  * the stopword/short-term filter, and the per-doc top-k bound.
  */
class TfidfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stop = Seq("the", "a")

  test("scores match the hand-computed ratio idf") {
    // N=3. df(cat)=2, df(dog)=1, df(hat)=3
    val docs = Seq(
      (1L, "cat cat dog hat"),
      (2L, "cat hat hat"),
      (3L, "hat the the"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, k = 10, stop)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3))
      .toMap
    def s(tf: Long, df: Double) = math.round(tf.toDouble * (3 - df + 0.5) / (df + 0.5) * 100)
    assert(out((1L, "cat")) == s(2, 2)) // 2*1.5/2.5*100 = 120
    assert(out((1L, "dog")) == s(1, 1)) // 1*2.5/1.5*100 = 167
    assert(out((1L, "hat")) == s(1, 3)) // 1*0.5/3.5*100 = 14
    assert(out((2L, "hat")) == s(2, 3))
  }

  test("rank orders by score desc with term tie-break, capped at k") {
    val docs = Seq(
      (1L, "zzz yyy xxx www vvv uuu zzz"), // zzz tf=2 wins; rest tie on tf
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, k = 3, stop)
      .orderBy("rank").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(1)).toSeq == Seq("zzz", "uuu", "vvv"))
    assert(rows.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
  }

  test("stopwords and short terms never surface as keywords") {
    val docs = Seq((1L, "the the the ab ab real")).toDF("doc_id", "text")
    val terms = TextAnalysis.tfidfKeywords(docs, k = 10, stop)
      .collect().map(_.getString(1)).toSet
    assert(terms == Set("real"))
  }
}
