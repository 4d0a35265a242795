package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hash/bit primitives used by the dedup & similarity
  * operators.
  *
  * Everything here is defined in terms of md5 hex digests, because md5
  * is bit-identical across Spark, DuckDB, and the JVM — which is what
  * lets MinHash/SimHash/LSH queries be verified against an external SQL
  * oracle hash-for-hash. All derived reductions are integer-valued
  * (sums of ±1, quantized components), so results are independent of
  * aggregation order — a requirement for a distributed engine whose
  * partial-aggregate order is nondeterministic.
  */
object HashBits {

  /** Bit `b` (0-based, little-endian within each hex nibble) of a hex
    * digest column: nibble = value of hex char `b/4`, bit = `(nibble >>
    * (b%4)) & 1`. Expressed with division/modulo arithmetic so both
    * operands can be Columns (codegen-friendly, no UDF).
    */
  def nibbleBit(hexCol: Column, b: Column): Column = {
    val nib = conv(hexCol.substr((b.cast("double") / 4).cast("int") + lit(1), lit(1)), 16, 10)
      .cast("int")
    // integer 2^(b%4) via a when-chain — pow() is a transcendental call
    // and this sits in per-word × per-bit hot loops
    val div = when(b % 4 === 0, 1).when(b % 4 === 1, 2).when(b % 4 === 2, 4).otherwise(8)
    (nib.cast("double") / div).cast("int") % 2
  }

  /** Same bit extraction on the driver, used to pre-materialize
    * hyperplane matrices as literals. Must stay in lockstep with
    * [[nibbleBit]] and the oracle SQL's
    * `(strpos('0123456789abcdef', substr(md5(k), b//4+1, 1)) - 1) >> (b%4) & 1`.
    */
  def md5Bits(key: String, nBits: Int): Seq[Int] = {
    val hex = md5Hex(key)
    (0 until nBits).map { b =>
      val nib = Integer.parseInt(hex.charAt(b / 4).toString, 16)
      (nib >> (b % 4)) & 1
    }
  }

  def md5Hex(s: String): String =
    MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_))
      .mkString
}
