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
