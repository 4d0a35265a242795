package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The MERGEABLE face of the [[HllSketch]] sketch: raw 4 KiB register
  * arrays as first-class binary values, so sketches can be built once,
  * stored, re-merged, and iterated — the primitive behind sketch
  * lakes (pre-aggregate registers per partition, roll up later
  * without touching raw data) and iterative register algebra like the
  * approximate neighborhood function (ANF / HyperBall: Palmer et al.
  * "ANF: a fast and scalable tool for data analysis in massive
  * graphs"; Boldi & Vigna "HyperBall"), where round t's sketch is the
  * bytewise max of round t−1's neighbors.
  *
  * Three functions, sharing [[HllSketch]]'s exact register derivation
  * (fnv63 → 12-bit bucket, 51-bit tail, rank capped at 30):
  *
  *   - `hll_init_regs(string)` (scalar): the singleton sketch — 4096
  *     bytes with the one register the value occupies.
  *   - `hll_merge_regs(binary)` (aggregate): bytewise max. Register
  *     merge IS set union — merge(sketch(A), sketch(B)) =
  *     sketch(A ∪ B) exactly, not approximately — which is what makes
  *     iterated merging correct and lets an oracle check a
  *     distributed merge tree against a direct sketch of the final
  *     set, bit for bit. Same 100-TB shape as [[HllSketch]]: fixed
  *     4 KiB state, map-side partial aggregation collapses any number
  *     of input sketches before the shuffle.
  *   - `hll_regs_eval(binary)` (scalar): registers → the same
  *     (estimate, nonzero_buckets, register_sum_scaled) struct as
  *     `hll_distinct`, same left-associative IEEE op order.
  *
  * Invariant (spec-pinned): `hll_regs_eval(hll_merge_regs(
  * hll_init_regs(x)))` over a group ≡ `hll_distinct(x)` over the same
  * group.
  */
object HllRegisters {
  val InitName = "hll_init_regs"
  val MergeName = "hll_merge_regs"
  val EvalName = "hll_regs_eval"
  val AggName = "hll_regs"

  import HllSketch.M

  private[functions] def registerOf(s: UTF8String): (Int, Byte) = {
    val h = Fnv63.hash(s)
    val bucket = (h >>> 51).toInt
    val tail = h & ((1L << 51) - 1)
    val rank =
      math.min(if (tail == 0L) 52 else java.lang.Long.numberOfLeadingZeros(tail) - 12, 30)
    (bucket, rank.toByte)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      if (!registry.functionExists(FunctionIdentifier(name))) {
        registry.registerFunction(
          FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)
      }
    reg(InitName, classOf[HllInitRegs], exprs => HllInitRegs(exprs.head))
    reg(MergeName, classOf[HllMergeRegs], exprs => HllMergeRegs(exprs.head))
    reg(EvalName, classOf[HllRegsEval], exprs => HllRegsEval(exprs.head))
    reg(AggName, classOf[HllRegsAgg], exprs => HllRegsAgg(exprs.head))
  }

  def init(spark: SparkSession, c: Column): Column = {
    register(spark); call_function(InitName, c)
  }
  def merge(spark: SparkSession, c: Column): Column = {
    register(spark); call_function(MergeName, c)
  }
  def eval(spark: SparkSession, c: Column): Column = {
    register(spark); call_function(EvalName, c)
  }
}

/** `hll_init_regs(string) → binary(4096)` — the singleton sketch. */
case class HllInitRegs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllRegisters.InitName} requires a string argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BinaryType
  override def prettyName: String = HllRegisters.InitName

  override protected def nullSafeEval(input: Any): Any = {
    val regs = new Array[Byte](HllSketch.M)
    val (bucket, rank) = HllRegisters.registerOf(input.asInstanceOf[UTF8String])
    regs(bucket) = rank
    regs
  }

  override protected def withNewChildInternal(newChild: Expression): HllInitRegs =
    copy(child = newChild)
}

/** `hll_merge_regs(binary) → binary(4096)` — bytewise-max aggregate
  * (= sketch of the union of everything merged in). Nulls ignored.
  */
case class HllMergeRegs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllRegisters.MergeName} requires a binary register array, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = HllRegisters.MergeName

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllSketch.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val other = v.asInstanceOf[Array[Byte]]
      require(other.length == HllSketch.M,
        s"${HllRegisters.MergeName}: register array of ${other.length} bytes, " +
          s"expected ${HllSketch.M} — input is not an hll_init_regs/hll_merge_regs sketch")
      var i = 0
      while (i < HllSketch.M) {
        // loud failure on foreign bytes, same policy as the width
        // check: a register outside [0,30] (e.g. a negative signed
        // byte) is not one of ours and would silently poison every
        // estimate downstream
        require(other(i) >= 0 && other(i) <= 30,
          s"${HllRegisters.MergeName}: register $i holds ${other(i)}, " +
            "outside [0,30] — input is not an hll_init_regs/hll_merge_regs sketch")
        if (other(i) > buffer(i)) buffer(i) = other(i)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllSketch.M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  // clone: the returned value escapes into a row while the buffer is reused
  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeRegs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeRegs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeRegs =
    copy(child = newChild)
}

/** `hll_regs(string) → binary(4096)` — the raw-value BUILDER aggregate:
  * identical register updates to [[HllSketch]] (update-in-place, no
  * per-row allocation, unlike mapping rows through `hll_init_regs`)
  * but evaluating to the raw registers instead of the estimate struct
  * — what a nightly sketch-lake job persists. Nulls ignored.
  */
case class HllRegsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllRegisters.AggName} requires a string argument, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = HllRegisters.AggName

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllSketch.M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (bucket, rank) = HllRegisters.registerOf(v.asInstanceOf[UTF8String])
      if (rank > buffer(bucket)) buffer(bucket) = rank
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllSketch.M) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegsAgg =
    copy(child = newChild)
}

/** `hll_regs_eval(binary) → struct(estimate, nonzero_buckets,
  * register_sum_scaled)` — identical math and IEEE op order to
  * [[HllSketch.eval]].
  */
case class HllRegsEval(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllRegisters.EvalName} requires a binary register array, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("nonzero_buckets", IntegerType, nullable = false),
    StructField("register_sum_scaled", LongType, nullable = false),
  ))
  override def prettyName: String = HllRegisters.EvalName

  override protected def nullSafeEval(input: Any): Any = {
    val buffer = input.asInstanceOf[Array[Byte]]
    require(buffer.length == HllSketch.M,
      s"${HllRegisters.EvalName}: register array of ${buffer.length} bytes, " +
        s"expected ${HllSketch.M}")
    var nonzero = 0
    var sScaled = 0L
    var i = 0
    while (i < HllSketch.M) {
      // same loud-failure policy as the width require: a byte outside
      // [0,30] would shift by an out-of-range amount (Java shifts mod
      // 64) and produce a silently garbage estimate
      require(buffer(i) >= 0 && buffer(i) <= 30,
        s"${HllRegisters.EvalName}: register $i holds ${buffer(i)}, " +
          "outside [0,30] — input is not an hll_init_regs/hll_merge_regs sketch")
      if (buffer(i) != 0) nonzero += 1
      sScaled += 1L << (30 - buffer(i))
      i += 1
    }
    val estimate = 0.7213 / (1 + 1.079 / 4096.0) * 4096.0 * 4096.0 /
      (sScaled.toDouble / 1073741824.0)
    new GenericInternalRow(Array[Any](estimate, nonzero, sScaled))
  }

  override protected def withNewChildInternal(newChild: Expression): HllRegsEval =
    copy(child = newChild)
}
