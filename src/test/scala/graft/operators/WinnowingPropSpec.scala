package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.HashBits

/** Randomized check of the array-based winnowing against an
  * independent Scala reference implementation of
  * Schleimer/Wilkerson/Aiken fingerprint selection.
  */
class WinnowingPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def reference(words: Seq[String], k: Int, w: Int): Option[(Long, String)] = {
    val grams = words.sliding(k).filter(_.length == k).map(_.mkString(" ")).toVector
    val hs = grams.map(HashBits.md5Hex)
    if (hs.length < w) None
    else {
      val fps = hs.sliding(w).filter(_.length == w).map(_.min).toVector.distinct
      Some((fps.length.toLong, HashBits.md5Hex(fps.sorted.mkString(","))))
    }
  }

  test("property: operator output equals the reference selection on " +
    "random word sequences (including short docs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0 until 60).map { i =>
      // lengths 0..24 words, with repetition to force duplicate grams
      val n = rnd.nextInt(25)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val k = 3; val w = 4
    val got = TextAnalysis
      .winnowing(docs.toDF("doc_id", "text"), k, w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getString(2))))
      .toMap
    val expect = docs.flatMap { case (id, text) =>
      val words = if (text.isEmpty) Seq("") else text.split(" ").toSeq
      reference(words, k, w).map(id -> _)
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty && got.size < docs.size) // both populated and culled
  }
}
