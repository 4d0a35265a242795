package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Prefix-filter similarity-join properties: the filtered join must
  * return EXACTLY the brute-force result (completeness is the whole
  * point of the operator — a false negative is silent data loss), at
  * and around the threshold boundary.
  */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exactJoin(docs: org.apache.spark.sql.DataFrame, n: Int, t: Double) = {
    val arr = TextDedup.shingleArrays(docs, n).persist()
    val sh = arr.select($"doc_id", explode($"shs").as("sh"))
    val cnt = arr.select($"doc_id", size($"shs").as("n"))
    val brute = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val viaBrute = TextDedup.jaccard(brute, sh, cnt).filter($"jaccard" >= t)
    val viaPrefix = TextDedup
      .jaccard(TextDedup.prefixFilterCandidates(arr, (t * 100).round.toInt), sh, cnt)
      .filter($"jaccard" >= t)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    (rows(viaBrute), rows(viaPrefix))
  }

  test("randomized corpora: prefix-filtered join equals brute force") {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 40).map(i => s"w$i")
    // base docs plus mutated near-copies: plenty of pairs on both
    // sides of the threshold
    val base = (1 to 15).map { id =>
      (id.toLong, (1 to 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val mutated = base.collect {
      case (id, text) if id % 2 == 0 =>
        val ws = text.split(" ")
        ws(rnd.nextInt(ws.length)) = vocab(rnd.nextInt(vocab.size))
        (id + 100L, ws.mkString(" "))
    }
    val docs = (base ++ mutated).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val (brute, prefix) = exactJoin(docs, 3, t)
      assert(prefix == brute,
        s"t=$t: prefix-filter diverged from brute force\n" +
          s"missing=${brute -- prefix}\nextra=${prefix -- brute}")
    }
  }

  test("pair at exactly the threshold is found") {
    // unigram shingles: |a| = |b| = 17, intersection 14 →
    // jaccard = 14/20 = 0.7 exactly
    val a = (1 to 17).map(i => s"w$i").mkString(" ")
    val b = ((1 to 14).map(i => s"w$i") ++ (15 to 17).map(i => s"x$i")).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val (brute, prefix) = exactJoin(docs, 1, 0.7)
    assert(brute == Set((1L, 2L, 0.7)) && prefix == brute)
  }

  test("pair just under the threshold is excluded by verification") {
    // intersection 13 of 17/17 → 13/21 ≈ 0.619 < 0.7
    val a = (1 to 17).map(i => s"w$i").mkString(" ")
    val b = ((1 to 13).map(i => s"w$i") ++ (14 to 17).map(i => s"x$i")).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val (brute, prefix) = exactJoin(docs, 1, 0.7)
    assert(brute.isEmpty && prefix.isEmpty)
  }

  test("tPct bounds are enforced") {
    val arr = TextDedup.shingleArrays(Seq((1L, "a b c")).toDF("doc_id", "text"), 1)
    intercept[IllegalArgumentException] { TextDedup.prefixFilterCandidates(arr, 0) }
    intercept[IllegalArgumentException] { TextDedup.prefixFilterCandidates(arr, 100) }
  }
}
