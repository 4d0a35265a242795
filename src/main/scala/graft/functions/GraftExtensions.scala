package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Declarative registration of graft's native expressions and
  * optimizer rules, for sessions configured with
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * (the SparkSessionExtensions route; `ArrayDotLong.register` and
  * `spark.experimental.extraOptimizations` are the imperative
  * equivalents for sessions we don't configure).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier(ArrayDotLong.name),
      new ExpressionInfo(classOf[ArrayDotLong].getName, ArrayDotLong.name),
      (exprs: Seq[Expression]) => ArrayDotLong(exprs.head, exprs(1))))
    extensions.injectFunction((
      FunctionIdentifier(Fnv63Hash.name),
      new ExpressionInfo(classOf[Fnv63Hash].getName, Fnv63Hash.name),
      (exprs: Seq[Expression]) => Fnv63Hash(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier(HllSketch.Name),
      new ExpressionInfo(classOf[HllSketch].getName, HllSketch.Name),
      (exprs: Seq[Expression]) => HllSketch(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier(BottomK.Name),
      new ExpressionInfo(classOf[BottomK].getName, BottomK.Name),
      (exprs: Seq[Expression]) => BottomK(exprs.head, exprs(1))))
    // the mergeable register family (sketch lakes, ANF)
    extensions.injectFunction((
      FunctionIdentifier(HllRegisters.InitName),
      new ExpressionInfo(classOf[HllInitRegs].getName, HllRegisters.InitName),
      (exprs: Seq[Expression]) => HllInitRegs(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier(HllRegisters.MergeName),
      new ExpressionInfo(classOf[HllMergeRegs].getName, HllRegisters.MergeName),
      (exprs: Seq[Expression]) => HllMergeRegs(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier(HllRegisters.AggName),
      new ExpressionInfo(classOf[HllRegsAgg].getName, HllRegisters.AggName),
      (exprs: Seq[Expression]) => HllRegsAgg(exprs.head)))
    extensions.injectFunction((
      FunctionIdentifier(HllRegisters.EvalName),
      new ExpressionInfo(classOf[HllRegsEval].getName, HllRegisters.EvalName),
      (exprs: Seq[Expression]) => HllRegsEval(exprs.head)))
    // rewrites naive interval range joins (nested loops) into binned
    // equi-joins; inert until spark.graft.rangeJoin.binWidth is set
    extensions.injectOptimizerRule(_ => graft.plans.RangeJoinBinning)
    // SQL-callable book replay: SELECT * FROM replay_book('feed_view')
    extensions.injectTableFunction((
      FunctionIdentifier(graft.plans.ReplayBookTVF.name),
      new ExpressionInfo(graft.plans.ReplayBookTVF.getClass.getName,
        graft.plans.ReplayBookTVF.name),
      graft.plans.ReplayBookTVF.builder))
  }
}
