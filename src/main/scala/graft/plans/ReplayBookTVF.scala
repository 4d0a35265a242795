package graft.plans

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, ExpressionInfo, In, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, MapPartitions, RepartitionByExpression, Sort}
import org.apache.spark.sql.types.StringType

import graft.model.{FeedMsg, Tick}
import graft.operators.BookReplay

/** SQL-callable book replay (SURVEY.md §2.8, optional surface): a
  * table-valued function so pure-SQL users can run the engine's core
  * operator without touching the Dataset API:
  *
  * {{{
  *   SELECT * FROM replay_book('feed_msgs')               -- all markets
  *   SELECT * FROM replay_book('feed_msgs', '0xM1', ...)  -- market IN-set
  * }}}
  *
  * The builder assembles exactly the logical plan `BookReplay.ticks`
  * declares through the Dataset API — optional market `Filter` BEFORE
  * the exchange, `RepartitionByExpression(assetId)`, a non-global
  * `Sort` on the arrival key (the spillable secondary sort), and the
  * typed `MapPartitions` fold — so SQL callers get the identical
  * physical plan, scale story included. First arg is the (temp view or
  * catalog) table name carrying FeedMsg-shaped rows; remaining args
  * are market-id string literals forming the F2 IN-set filter.
  *
  * Registered via `GraftExtensions` (`injectTableFunction`) for
  * `spark.sql.extensions`-configured sessions, or imperatively with
  * `ReplayBookTVF.register(spark)`.
  */
object ReplayBookTVF {
  val name = "replay_book"

  private val info = new ExpressionInfo(getClass.getName, name)

  /** Seq[Expression] => LogicalPlan, shared by both registration routes. */
  val builder: Seq[Expression] => LogicalPlan = { exprs =>
    require(exprs.nonEmpty,
      s"$name requires a table name argument: $name('<table>'[, '<market>'...])")
    val table = exprs.head match {
      case Literal(s, StringType) if s != null => s.toString
      case other =>
        throw new IllegalArgumentException(
          s"$name: first argument must be a string table name, got $other")
    }
    val markets = exprs.tail
    markets.foreach {
      case Literal(_, StringType) => ()
      case other =>
        throw new IllegalArgumentException(
          s"$name: market filter arguments must be string literals, got $other")
    }
    val scan = UnresolvedRelation(table.split('.').toIndexedSeq)
    val filtered =
      if (markets.isEmpty) scan
      else Filter(In(UnresolvedAttribute("market"), markets), scan)
    fold(filtered)
  }

  /** The replay fold as a logical plan over any FeedMsg-shaped child —
    * the same repartition + sortWithinPartitions + mapPartitions shape
    * as `BookReplay.ticks` (see its scaladoc for the distribution
    * argument).
    */
  private def fold(child: LogicalPlan): LogicalPlan = {
    val repart = RepartitionByExpression(
      Seq(UnresolvedAttribute("assetId")), child, None)
    val sorted = Sort(
      Seq("assetId", "fileHour", "lineNo", "msgIdx")
        .map(c => SortOrder(UnresolvedAttribute(c), Ascending)),
      global = false, repart)
    MapPartitions[FeedMsg, Tick](BookReplay.foldPartition, sorted)(
      Encoders.product[FeedMsg], Encoders.product[Tick])
  }

  /** Imperative registration — safe to call repeatedly, works in any
    * session (no extensions config required).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.tableFunctionRegistry
    if (!registry.functionExists(FunctionIdentifier(name))) {
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
