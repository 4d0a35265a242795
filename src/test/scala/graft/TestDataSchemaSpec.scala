package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-table schemas (TESTDATA.md) so a testdata
  * regeneration that changes an encoding breaks CI loudly instead of
  * silently dropping gate rows — round 4 lost 4 queries to an
  * unannounced NANOS→MICROS-NTZ flip of `events.ts` that `sbt test`
  * could not see because the suite never read `/root/testdata`.
  *
  * Two layers:
  *  - exact (name, type) pins for all 10 driver tables at sf0.001,
  *    asserted AFTER `Tables` normalization (so `events.ts` must be a
  *    true TimestampType whatever the parquet encoding);
  *  - unit fixtures for both `ts` encodings seen so far (nanos-as-long
  *    under nanosAsLong, micros-NTZ) proving `Tables.events` normalizes
  *    each to TimestampType with identical values.
  */
class TestDataSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).isDirectory

  private def fields(df: org.apache.spark.sql.DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType))

  test("driver tables carry the pinned (name, type) lists") {
    assume(available, s"$sfDir not present")
    val t = Tables(spark, sfDir)
    assert(fields(t.region) === Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields(t.nation) === Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assert(fields(t.customer) === Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assert(fields(t.supplier) === Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assert(fields(t.part) === Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    // orders/lineitem date columns may arrive TZ or NTZ from parquet;
    // both are consumed value-wise under the pinned UTC session, so pin
    // "some timestamp type" rather than the parquet flavor.
    val ordersF = fields(Tables(spark, sfDir).orders)
    assert(ordersF.map(_._1) === Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(Set[DataType](TimestampType, TimestampNTZType).contains(ordersF(4)._2))
    val liF = fields(t.lineitem)
    assert(liF.map(_._1) === Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    assert(Set[DataType](TimestampType, TimestampNTZType).contains(liF(10)._2))
    assert(fields(t.documents) === Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fields(t.embeddings) === Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("events.ts is a true TimestampType after Tables normalization") {
    assume(available, s"$sfDir not present")
    val ev = Tables(spark, sfDir).events
    assert(fields(ev).map(_._1) === Seq(
      "event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(ev.schema("ts").dataType === TimestampType,
      "events.ts must normalize to TimestampType — watermarks and " +
        "unix_millis throw on TIMESTAMP_NTZ (the round-4 regression)")
    // And the type must be usable where the regression bit: epoch math.
    val ms = ev.select(unix_millis(col("ts"))).limit(1).collect()
    assert(ms.nonEmpty)
  }

  private def writeFixture(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-fixture").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.events normalizes micros-NTZ parquet to TimestampType, value-preserving") {
    import spark.implicits._
    val micros = 1718000000000000L // 2024-06-10T06:13:20Z
    val dir = writeFixture(
      Seq((1L, micros)).toDF("event_id", "us")
        .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
        .drop("us"))
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }

  test("Tables.events normalizes nanos-as-long to TimestampType, truncating to micros") {
    import spark.implicits._
    // Under spark.sql.legacy.parquet.nanosAsLong a TIMESTAMP(NANOS)
    // column surfaces as plain LongType — a stored int64 exercises the
    // identical branch.
    val nanos = 1718000000000000123L
    val dir = writeFixture(Seq((1L, nanos)).toDF("event_id", "ts"))
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() === nanos / 1000L)
  }
}
