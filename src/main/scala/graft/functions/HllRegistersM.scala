package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WIDTH-PARAMETERIZED register sketches — [[HllRegisters]] with the
  * bucket count `m` as a knob instead of the fixed 4096. The register
  * payload is the unit of cost in iterated sketch algebra (the
  * temporal-ANF rounds move one register binary per active pointer),
  * and reach profiling rarely needs 4096 buckets' ε ≈ 1.6 %: m = 512
  * is ε ≈ 1.04/√512 ≈ 4.6 % at an 8× smaller payload — the knob a
  * 100-TB deployment actually turns. Same fnv63 hash, same register
  * semantics, same exact-union merge contract; at m = 4096 the bytes
  * are IDENTICAL to [[HllRegisters]]' (spec-pinned), so the fixed
  * family is the m = 4096 point of this one.
  *
  *   - `hll_init_regs_w(string, m)`: singleton sketch, m bytes. The
  *     top log2(m) hash bits pick the bucket, the remaining 63−log2(m)
  *     are the rank tail (rank capped at 30, as in [[HllSketch]]).
  *   - `hll_merge_regs_w(binary)` (aggregate): bytewise max; width
  *     inferred from the first input (all inputs must agree — a mixed
  *     width raises loudly, it is sketch corruption, not data).
  *   - `hll_regs_eval_w(binary)`: (estimate, nonzero_buckets,
  *     register_sum_scaled) with the width read from the array length;
  *     alpha(m) = 0.7213/(1 + 1.079/m) (the m ≥ 128 constant), the
  *     same scaled-sum IEEE op order as the fixed family.
  */
object HllRegistersM {
  val InitName = "hll_init_regs_w"
  val MergeName = "hll_merge_regs_w"
  val EvalName = "hll_regs_eval_w"

  private[graft] def checkWidth(m: Int): Unit =
    require(m >= 128 && m <= 65536 && Integer.bitCount(m) == 1,
      s"register width must be a power of two in [128, 65536], got $m " +
        "(alpha(m) below 128 needs different constants)")

  private[functions] def registerOf(s: UTF8String, m: Int): (Int, Byte) = {
    val p = Integer.numberOfTrailingZeros(m)
    val h = Fnv63.hash(s)
    val bucket = (h >>> (63 - p)).toInt
    val tail = h & ((1L << (63 - p)) - 1)
    val rank = math.min(
      if (tail == 0L) 52 else java.lang.Long.numberOfLeadingZeros(tail) - p, 30)
    (bucket, rank.toByte)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      if (!registry.functionExists(FunctionIdentifier(name))) {
        registry.registerFunction(
          FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)
      }
    reg(InitName, classOf[HllInitRegsW], exprs => HllInitRegsW(exprs(0), exprs(1)))
    reg(MergeName, classOf[HllMergeRegsW], exprs => HllMergeRegsW(exprs.head))
    reg(EvalName, classOf[HllRegsEvalW], exprs => HllRegsEvalW(exprs.head))
  }
}

/** `hll_init_regs_w(string, m) → binary(m)` — singleton sketch at
  * width m (foldable positive power of two).
  */
case class HllInitRegsW(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"${HllRegistersM.InitName} requires (string, int), got " +
          left.dataType.simpleString)
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"${HllRegistersM.InitName}: width must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def prettyName: String = HllRegistersM.InitName

  override protected def nullSafeEval(input: Any, width: Any): Any = {
    val m = width.asInstanceOf[Int]
    HllRegistersM.checkWidth(m)
    val regs = new Array[Byte](m)
    val (bucket, rank) = HllRegistersM.registerOf(input.asInstanceOf[UTF8String], m)
    regs(bucket) = rank
    regs
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllInitRegsW =
    copy(left = newLeft, right = newRight)
}

/** `hll_merge_regs_w(binary) → binary` — bytewise-max aggregate at
  * whatever width the inputs share; empty-group result is an empty
  * binary (no width to invent). Nulls ignored.
  */
case class HllMergeRegsW(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllRegistersM.MergeName} requires a binary register array, got " +
        child.dataType.simpleString)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = HllRegistersM.MergeName

  // width comes from the first input — the empty array is the
  // "no width yet" identity
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  // Validation for the empty-buffer EARLY-ADOPT branch only: a corrupt
  // sketch in a single-input group would otherwise be cloned in
  // unchecked and fail only at eval — or never, if the merged binary is
  // stored unread. The non-adopt path keeps its range check FUSED into
  // the merge loop (this aggregate is the engine's hottest; a separate
  // validation pass would double the array traversals per row).
  private def validate(other: Array[Byte]): Unit = {
    HllRegistersM.checkWidth(other.length)
    var i = 0
    while (i < other.length) {
      require(other(i) >= 0 && other(i) <= 30,
        s"${HllRegistersM.MergeName}: register $i holds ${other(i)}, " +
          "outside [0,30] — input is not an hll_init_regs_w sketch")
      i += 1
    }
  }

  private def mergeInto(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) { validate(other); return other.clone() }
    require(other.length == buffer.length,
      s"${HllRegistersM.MergeName}: mixed register widths " +
        s"(${buffer.length} vs ${other.length}) — sketches from different " +
        "hll_init_regs_w widths cannot merge")
    var i = 0
    while (i < buffer.length) {
      require(other(i) >= 0 && other(i) <= 30,
        s"${HllRegistersM.MergeName}: register $i holds ${other(i)}, " +
          "outside [0,30] — input is not an hll_init_regs_w sketch")
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else mergeInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    mergeInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any = buffer.clone()

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeRegsW =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeRegsW =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeRegsW =
    copy(child = newChild)
}

/** `hll_regs_eval_w(binary) → struct(estimate, nonzero_buckets,
  * register_sum_scaled)` — width from the array length.
  */
case class HllRegsEvalW(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${HllRegistersM.EvalName} requires a binary register array, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("nonzero_buckets", IntegerType, nullable = false),
    StructField("register_sum_scaled", LongType, nullable = false),
  ))
  override def prettyName: String = HllRegistersM.EvalName

  override protected def nullSafeEval(input: Any): Any = {
    val buffer = input.asInstanceOf[Array[Byte]]
    HllRegistersM.checkWidth(buffer.length)
    val m = buffer.length
    var nonzero = 0
    var sScaled = 0L
    var i = 0
    while (i < m) {
      require(buffer(i) >= 0 && buffer(i) <= 30,
        s"${HllRegistersM.EvalName}: register $i holds ${buffer(i)}, " +
          "outside [0,30] — input is not an hll_init_regs_w sketch")
      if (buffer(i) != 0) nonzero += 1
      sScaled += 1L << (30 - buffer(i))
      i += 1
    }
    val md = m.toDouble
    val estimate = 0.7213 / (1 + 1.079 / md) * md * md /
      (sScaled.toDouble / 1073741824.0)
    new GenericInternalRow(Array[Any](estimate, nonzero, sScaled))
  }

  override protected def withNewChildInternal(newChild: Expression): HllRegsEvalW =
    copy(child = newChild)
}
