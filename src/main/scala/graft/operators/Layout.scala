package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering pass a lake runs at write time so that range predicates
  * on EITHER dimension prune files (what Delta's OPTIMIZE ZORDER and
  * Iceberg's sort orders do): rows sorted by the interleaved key land
  * so that any prefix of the key is an axis-aligned rectangle
  * (quadtree cell) in dimension space, and per-file min/max zone maps
  * on both dimensions stay tight.
  *
  * Everything is literal-shift integer arithmetic unrolled at plan
  * time (no UDF, no HOF lambda, stays in whole-stage codegen), and —
  * as with [[Shards]] — deterministic in any engine, so zone-map
  * contents are oracle-checkable.
  *
  * The deterministic clustering here is `cell` = the top bits of the
  * z-value: a pure NARROW map (quadtree cell assignment) followed by
  * one groupBy for the stats — no global sort anywhere. A production
  * writer that wants balanced file sizes instead of fixed cells uses
  * `repartitionByRange(zCol)` + `sortWithinPartitions(zCol)` — fully
  * parallel, but with sampled (non-reproducible) boundaries, which is
  * why the oracle-checked surface is the fixed-cell form.
  */
object Layout {

  /** Exact integer division of non-negative long columns without a
    * `div` Column operator: subtracting the remainder first makes the
    * numerator divisible, so the double division is exact (both
    * operands < 2⁵³) and the cast truncates nothing.
    */
  private def idiv(n: Column, d: Column): Column =
    ((n - n % d) / d).cast("long")

  /** Range-normalize a non-negative integral column from [0, domain)
    * into `bits` bits: (v · 2^bits) div domain. Pure integer — any
    * engine agrees — and order-preserving.
    */
  def scaleTo(v: Column, domain: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"scaleTo: bits ($bits) out of range")
    require(domain >= 1 && domain <= (Long.MaxValue >> (bits + 1)),
      s"scaleTo: domain ($domain) would overflow the scaled numerator")
    idiv(v.cast("long") * lit(1L << bits), lit(domain))
  }

  /** Interleave the low `bits` bits of two non-negative longs into a
    * 2·bits-bit Morton key: bit i of `a` lands at z-bit 2i, bit i of
    * `b` at z-bit 2i+1 (b is the "outer" dimension at equal i).
    */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 21, s"zvalue: bits ($bits) must keep 2*bits <= 42")
    (0 until bits).map { i =>
      (idiv(a.cast("long"), lit(1L << i)) % 2) * lit(1L << (2 * i)) +
        (idiv(b.cast("long"), lit(1L << i)) % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Quadtree cell id: the top `cellBits` bits of a 2·bits-bit
    * z-value. Rows sharing a cell form an axis-aligned rectangle in
    * (a, b) space.
    */
  def zcell(z: Column, bits: Int, cellBits: Int): Column = {
    require(cellBits >= 1 && cellBits <= 2 * bits,
      s"zcell: cellBits ($cellBits) must be in [1, ${2 * bits}]")
    idiv(z, lit(1L << (2 * bits - cellBits)))
  }
}
