package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only, not part of the driver contract). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.operators.VectorSim
    graft.functions.ArrayDotLong.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), VectorSim.quantize(col("embedding")).as("q"))
      .withColumn("n2", VectorSim.qnorm2(col("q")))
    t("e-scan")(noop(e))
    val sigs = VectorSim.rpSignature(e, 64, 32)
    t("sigs")(noop(sigs))
    t("sigs2")(noop(sigs))
    val bands = VectorSim.sigBands(sigs, "vec_id", 32, 8)
    t("bands-lsh")(noop(bands))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_bits") === col("b.band_bits") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    t("cand")(noop(cand))
    println(s"[prof] cand rows: ${cand.count()}")
    val ver = cand
      .join(e.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("n2").as("na")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("n2").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        VectorSim.qcosine(VectorSim.qdotNative(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= 0.4)
    t("verify")(noop(ver))
    t("verify-distinct")(noop(ver.distinct()))

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    t("warm-scan")(noop(docs.toDF()))
    val arr0 = graft.operators.TextDedup.shingleArrays(docs, 3)
    t("shingle-arrays")(noop(arr0))
    val arr = arr0.persist()
    t("persist-materialize")(noop(arr))
    val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
    val cnt = arr.select(col("doc_id"), size(col("shs")).as("n"))
    val sigp = graft.operators.TextDedup.minhashSignature(arr, 8)
    t("sig")(noop(sigp))
    t("sig2")(noop(sigp))
    val mhBands = graft.operators.TextDedup.minhashBands(sigp, 8, 2)
    t("bands")(noop(mhBands))
    val pairs = graft.operators.TextDedup.bandPairs(mhBands)
    t("pairs")(noop(pairs))
    val jac = graft.operators.TextDedup.jaccard(pairs, sh, cnt)
    t("jaccard")(noop(jac))
    t("jaccard2")(noop(jac))
    spark.stop()
  }
}
