package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Catalyst optimizer rule: rewrite a naive interval range join
  *
  * {{{ points JOIN intervals ON ts >= lo AND ts <= hi }}}
  *
  * — which Spark can only execute as a (broadcast) nested loop, i.e.
  * O(|points| × |intervals|) work — into the binned EQUI-join
  * `TemporalJoins.rangeJoinBinned` builds by hand: both sides gain a
  * `floor(expr / binWidth)` bin key (the interval side explodes to
  * every bin it overlaps), the join becomes a hash/sort-merge join on
  * the bin, and the ORIGINAL predicates are kept as the join
  * condition so semantics are exactly preserved (inverted or null
  * intervals produce candidate bins whose rows the retained predicate
  * then rejects — same result as the nested loop).
  *
  * The rule fires only when ALL of:
  *   - `spark.graft.rangeJoin.binWidth` is set (> 0) — the width
  *     encodes the caller's knowledge of typical interval span, which
  *     no rule can infer without statistics; an order-of-magnitude
  *     overshoot only costs extra refine work, an undershoot costs
  *     interval replication (span/width bins per row);
  *   - the join is INNER with no equality conjunct across sides (if
  *     one exists, Spark already plans a hash join and the rewrite
  *     would only add overhead);
  *   - the condition contains a `p >= lo AND p <= hi` sandwich where
  *     `p` is integral and references exactly one side, and lo/hi the
  *     other ('>' / '<' also qualify — strictness lives in the
  *     retained predicates).
  *
  * Replication guard: an interval spanning `(hi-lo)/binWidth` bins
  * replicates to that many rows, and an open-ended sentinel `hi`
  * (e.g. `Long.MaxValue`) would blow past Spark's array-length cap at
  * runtime — turning a slow-but-working nested-loop query into an
  * error. `spark.graft.rangeJoin.maxBinsPerRow` (default 65536) bounds
  * the per-row replication, with two behaviours under
  * `spark.graft.rangeJoin.overflowMode`:
  *
  *   - `error` (default): an overflowing interval raises a descriptive
  *     error naming both confs — binWidth is a caller assertion about
  *     interval spans, and a violation is a data surprise that should
  *     be loud, not a silent 10⁹-row explosion;
  *   - `catchall`: exact semantics at any span — overflowing intervals
  *     map to a single catch-all bin that every point also carries (a
  *     second tagged bin per point row), so huge intervals degrade to
  *     the nested-loop cost *for those rows only* while normal
  *     intervals stay equi-joined. This is the skew-guard shape for
  *     data with rare unbounded intervals; it costs 2× point-side
  *     join-key fanout, which is why it is not the default.
  *
  * Registered via `graft.functions.GraftExtensions`
  * (`injectOptimizerRule`) or imperatively through
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinBinning extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"
  private val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerRow"
  private val OverflowModeKey = "spark.graft.rangeJoin.overflowMode"

  private def binWidth: Option[Long] =
    conf.getConfString(ConfKey, "").toLongOption.filter(_ > 0)

  private def maxBinsPerRow: Long =
    conf.getConfString(MaxBinsKey, "").toLongOption.filter(_ > 0).getOrElse(65536L)

  private def catchAllMode: Boolean =
    conf.getConfString(OverflowModeKey, "error").trim.toLowerCase == "catchall"

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  /** expr references only `side`'s output (and at least one of it). */
  private def onlyOn(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint) =>
          val conjuncts = splitConjuncts(cond)
          val hasEqui = conjuncts.exists {
            case EqualTo(a, b) =>
              (onlyOn(a, left) && onlyOn(b, right)) ||
                (onlyOn(a, right) && onlyOn(b, left))
            case _ => false
          }
          if (hasEqui) j
          else findSandwich(conjuncts, left, right) match {
            case Some((point, lo, hi, pointOnLeft)) =>
              val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)
              val bw = Literal(w, LongType)
              val cap = maxBinsPerRow
              def binOf(e: Expression): Expression =
                Floor(Divide(Cast(e, DoubleType), Cast(bw, DoubleType)))
              val binLo = binOf(lo)
              val binHi = binOf(hi)
              val seq = Sequence(binLo, binHi, None, Some(conf.sessionLocalTimeZone))
              val overflow =
                GreaterThan(Add(Subtract(binHi, binLo), Literal(1L)), Literal(cap))
              val (pPlan, pKey, iGen) =
                if (!catchAllMode) {
                  // error mode: keep the narrow single-long bin key; an
                  // overflowing interval fails loudly with the fix spelled
                  // out instead of hitting Spark's array-length cap.
                  val msg = "graft range-join binning: an interval spans more than " +
                    s"$cap bins at binWidth=$w; raise $MaxBinsKey, set " +
                    s"$OverflowModeKey=catchall, or unset $ConfKey for this query"
                  val guarded =
                    If(overflow, Cast(new RaiseError(Literal(msg)), seq.dataType), seq)
                  val pBin = Alias(binOf(point), "__graft_bin_p")()
                  val gOut = AttributeReference("__graft_bin_i", LongType)()
                  (Project(pSide.output :+ pBin, pSide),
                    pBin.toAttribute,
                    Generate(Explode(guarded), Nil, outer = false,
                      qualifier = None, generatorOutput = Seq(gOut), child = iSide))
                } else {
                  // catch-all mode: tagged bins — (0, bin) for real bins,
                  // (1, 0) as the catch-all every point row also carries;
                  // overflowing intervals emit ONLY the catch-all, so they
                  // meet every point once and the retained original
                  // predicate refines — exact at any span.
                  def tagged(tag: Int, bin: Expression) = CreateNamedStruct(Seq(
                    Literal("t"), Literal(tag), Literal("b"), bin))
                  val lv = NamedLambdaVariable("b", LongType, nullable = true)
                  val taggedSeq =
                    ArrayTransform(seq, LambdaFunction(tagged(0, lv), Seq(lv)))
                  val iBins = If(overflow,
                    CreateArray(Seq(tagged(1, Literal(0L)))), taggedSeq)
                  val pBins = CreateArray(Seq(
                    tagged(0, binOf(point)), tagged(1, Literal(0L))))
                  val keyType = StructType(Seq(
                    StructField("t", IntegerType, nullable = false),
                    StructField("b", LongType)))
                  val pOut = AttributeReference("__graft_bin_p", keyType)()
                  val iOut = AttributeReference("__graft_bin_i", keyType)()
                  (Generate(Explode(pBins), Nil, outer = false,
                    qualifier = None, generatorOutput = Seq(pOut), child = pSide),
                    pOut,
                    Generate(Explode(iBins), Nil, outer = false,
                      qualifier = None, generatorOutput = Seq(iOut), child = iSide))
                }
              val newCond = And(EqualTo(pKey, iGen.generatorOutput.head), cond)
              val (nl, nr) =
                if (pointOnLeft) (pPlan: LogicalPlan, iGen: LogicalPlan)
                else (iGen: LogicalPlan, pPlan: LogicalPlan)
              // restore the original output (drop the helper columns)
              Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
            case None => j
          }
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Find (point, lo, hi, pointOnLeft): a lower and an upper bound on
    * the SAME integral single-side expression, bounded by the other
    * side. Normalizes all four comparison orientations.
    */
  private def findSandwich(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan,
  ): Option[(Expression, Expression, Expression, Boolean)] = {
    // (point, bound, isLower) triples from each conjunct
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case LessThan(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Nil
    }
    def sided(point: Expression, bound: Expression): Option[Boolean] =
      if (onlyOn(point, left) && onlyOn(bound, right)) Some(true)
      else if (onlyOn(point, right) && onlyOn(bound, left)) Some(false)
      else None
    val candidates = for {
      (p, lo, true) <- bounds
      if integral(p)
      pl <- sided(p, lo).toSeq
      (p2, hi, false) <- bounds
      if p2.semanticEquals(p) && integral(hi) && integral(lo)
      if sided(p2, hi).contains(pl)
    } yield (p, lo, hi, pl)
    candidates.headOption
  }
}
