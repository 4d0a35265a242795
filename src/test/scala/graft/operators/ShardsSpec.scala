package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Shard assignment: ids land in range, assignment is a pure function
  * of the id, and the writer shape is sorted within each partition.
  */
class ShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("assignment is stable, in range, and roughly balanced") {
    val df = (1L to 2000L).toDF("doc_id")
    val a = Shards.assign(df, "doc_id", 16).select($"doc_id", $"shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.forall(s => s >= 0 && s < 16))
    val sizes = a.values.groupBy(identity).map(_._2.size)
    // hash balance: every shard within 3× of fair share (125)
    assert(sizes.min > 40 && sizes.max < 375, sizes.toString)
    // re-derivable: second run identical
    val b = Shards.assign(df, "doc_id", 16).select($"doc_id", $"shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("shuffled(): rows sorted by (shard, okey) within every partition") {
    val df = (1L to 500L).toDF("doc_id")
    val parts = Shards.shuffled(df, "doc_id", 8)
      .select($"shard", $"okey")
      .rdd.mapPartitions { it =>
        val keys = it.map(r => (r.getLong(0), r.getString(1))).toVector
        Iterator((keys, keys == keys.sorted))
      }.collect()
    assert(parts.forall(_._2), "unsorted partition found")
    assert(parts.map(_._1.size).sum == 500)
  }
}
