package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.HashBits

/** Unit semantics of the dedup / similarity building blocks. */
class DedupSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("shingles: word n-grams, distinct, short docs empty") {
    val sh = TextDedup.shingles(docs(1L -> "a b c d", 2L -> "x y"), 3)
      .as[(Long, String)].collect().toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("driver-side md5 bits equal the Column-side nibble bits") {
    val key = "h7"
    val driverBits = HashBits.md5Bits(key, 64)
    val sqlBits = spark.range(64).select(
      HashBits.nibbleBit(md5(lit(key)), $"id".cast("int")).as("b"))
      .as[Int].collect().toSeq
    assert(driverBits == sqlBits)
  }

  test("identical docs: minhash signatures equal, jaccard = 1; " +
    "shingle-less docs are excluded from signatures") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e f", 3L -> "q r s t u v",
      4L -> "too short")
    val arr = TextDedup.shingleArrays(d, 3)
    val mh = TextDedup.minhashSignature(arr, 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    assert(mh(1L) == mh(2L) && mh(1L) != mh(3L))
    assert(mh.values.flatten.forall(_ >= 0L)) // 60-bit halves: no overflow
    assert(!mh.contains(4L)) // no shingles → no signature row
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val sh = TextDedup.shingles(d, 3)
    val j = TextDedup.jaccard(pairs, sh).select($"jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash: identical docs equal (hamming 0), disjoint docs differ") {
    val d = docs(1L -> "a b c d", 2L -> "a b c d", 3L -> "zz yy xx ww vv uu tt ss")
    val sigs = TextDedup.simhash(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs.values.forall(_.length == 64))
    assert(sigs(1L) == sigs(2L))
    val ham = d.sparkSession.range(1)
      .select(TextDedup.hamming(lit(sigs(1L)), lit(sigs(3L)), 64).as("h"))
      .as[Int].head()
    assert(ham > 0)
  }

  test("vector kernels: quantized dot/cosine and exact cosine") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(2.0f, 0.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
      .select($"vec_id", VectorSim.quantize($"embedding").as("q"), $"embedding")
    val m = df.select($"vec_id", $"q").as[(Long, Seq[Long])].collect().toMap
    assert(m(1L) == Seq(1000L, 0L, 0L) && m(3L) == Seq(2000L, 0L, 0L))

    val pairs = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        VectorSim.qcosine(
          VectorSim.qdot(col("a.q"), col("b.q")),
          VectorSim.qnorm2(col("a.q")), VectorSim.qnorm2(col("b.q"))).as("qc"),
        VectorSim.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(pairs((1L, 2L)) == ((0.0, 0.0))) // orthogonal
    assert(pairs((1L, 3L)) == ((1.0, 1.0))) // parallel
  }

  test("rp-LSH: identical vectors share all bands; signature is stable") {
    val df = Seq(
      (1L, Seq.fill(64)(0.5f)),
      (2L, Seq.fill(64)(0.5f)),
      (3L, Seq.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)),
    ).toDF("vec_id", "embedding")
      .select($"vec_id", VectorSim.quantize($"embedding").as("q"))
    val sigs = VectorSim.rpSignature(df, 64, 32)
      .select($"vec_id", $"sig").as[(Long, String)].collect().toMap
    assert(sigs.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
    assert(sigs(1L) == sigs(2L))
    val bands = VectorSim.sigBands(VectorSim.rpSignature(df, 64, 32), "vec_id", 32, 8)
    assert(bands.filter($"vec_id" === 1).count() == 8)
  }
}
