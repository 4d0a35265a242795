package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Morton interleave bit placement, scaleTo range mapping, and the
  * quadtree-cell rectangle property zone maps depend on.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zvalue interleaves bits: a at even positions, b at odd") {
    import spark.implicits._
    // a=5 (101), b=3 (011), bits=3 → z = a0·1 + b0·2 + a1·4 + b1·8 + a2·16 + b2·32
    //                                 = 1 + 2 + 0 + 8 + 16 + 0 = 27
    val rows = Seq((5L, 3L), (0L, 0L), (7L, 7L), (4L, 1L)).toDF("a", "b")
      .select(Layout.zvalue($"a", $"b", 3).as("z")).as[Long].collect()
    assert(rows.toSeq == Seq(27L, 0L, 63L, 18L))
  }

  test("zvalue is order-preserving per dimension within a fixed other") {
    import spark.implicits._
    val zs = (0L until 32L).toDF("a")
      .select(Layout.zvalue($"a", lit(0L), 5).as("z")).as[Long].collect()
    assert(zs.toSeq == zs.sorted.toSeq) // b fixed → z monotone in a
  }

  test("scaleTo maps [0, domain) into [0, 2^bits) preserving order") {
    import spark.implicits._
    val scaled = Seq(0L, 1L, 149L).toDF("v")
      .select(Layout.scaleTo($"v", 150, 10).as("s")).as[Long].collect()
    assert(scaled(0) == 0L && scaled(2) == (149L * 1024L) / 150L)
    assert(scaled(2) < 1024L)
    assert(scaled.toSeq == scaled.sorted.toSeq)
  }

  test("idiv-based math is exact at 40-bit magnitudes") {
    import spark.implicits._
    val big = (1L << 40) - 3
    val got = Seq(big).toDF("v")
      .select(Layout.zcell($"v", bits = 21, cellBits = 20).as("c")).as[Long].head()
    assert(got == big / (1L << 22))
  }

  test("every quadtree cell is an axis-aligned rectangle no wider than its tile") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(4000)((rnd.nextInt(150).toLong, rnd.nextInt(1440).toLong))
    val cells = pts.toDF("u", "m")
      .select(
        Layout.scaleTo($"u", 150, 10).as("ua"),
        Layout.scaleTo($"m", 1440, 10).as("mb"))
      .select($"ua", $"mb",
        Layout.zcell(Layout.zvalue($"ua", $"mb", 10), 10, 6).as("cell"))
      .groupBy($"cell")
      .agg(
        (max($"ua") - min($"ua")).as("wa"),
        (max($"mb") - min($"mb")).as("wb"))
      .collect()
    // 6 cell bits = 3 from each dimension → tiles of 2^7 = 128 per axis
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getLong(1) < 128 && r.getLong(2) < 128,
        s"cell ${r.getLong(0)} spans ${r.getLong(1)}×${r.getLong(2)}")
    }
  }
}
