package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: for each user, the
  * earliest time of stage 1, then the earliest stage-2 event STRICTLY
  * AFTER it, then the earliest stage-3 event after that, and so on —
  * the classic conversion funnel (each stage's timestamp is null once
  * the chain breaks; `stage` counts completed steps).
  *
  * Scale shape: one filter→groupBy(user) aggregation per stage plus a
  * join back to the accumulating per-user row — every shuffle is keyed
  * on the user column, so all k stages reuse one hash partitioning
  * (Catalyst collapses the exchanges), and per-stage state is one
  * timestamp per user, never the user's event list (the collect_list
  * formulation would put a power-user's whole history in one row —
  * this one stays flat). Linear in events, k passes.
  */
object Funnel {

  def funnel(
      events: DataFrame,
      stages: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
  ): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate stage in $stages")
    val u = col(userCol)
    def tcol(s: String) = s"t_$s"
    val first = events
      .filter(col(typeCol) === stages.head)
      .groupBy(u)
      .agg(min(col(tsCol)).as(tcol(stages.head)))
    val full = stages.tail.foldLeft((first, stages.head)) {
      case ((acc, prev), st) =>
        val nxt = events
          .filter(col(typeCol) === st)
          .join(acc.select(u, col(tcol(prev))), userCol)
          .filter(col(tsCol) > col(tcol(prev)))
          .groupBy(u)
          .agg(min(col(tsCol)).as(tcol(st)))
        (acc.join(nxt, Seq(userCol), "left"), st)
    }._1
    full.withColumn("stage",
      stages.map(s => when(col(tcol(s)).isNotNull, 1).otherwise(0)).reduce(_ + _))
  }
}
