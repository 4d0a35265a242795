package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval building — turning an
  * event/CDC stream of per-key state observations into effective-dated
  * version rows `(key, version, state, valid_from, valid_to)`, the
  * standard warehouse shape for "what was this key's state at time t"
  * lookups (which then join via [[TemporalJoins.asOfJoin]]).
  *
  * Consecutive observations of the SAME state collapse into one
  * version; a state change opens a new one. The current version's
  * `valid_to` is NULL (open-ended).
  *
  * Shape: everything happens inside ONE partitioning by key — the
  * change-detection lag, the running version sum, the per-version
  * aggregation, and the valid_to lead all share the (key) hash
  * partitioning, so Catalyst plans a single exchange and the memory
  * high-water mark is one key's history per task. Ties on the
  * timestamp break on `ordCol` so versions are reproducible.
  */
object Scd {

  def intervals(
      obs: DataFrame,
      keyCol: String,
      stateCol: String,
      tsCol: String,
      ordCol: String,
  ): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val byVer = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    obs
      .withColumn("__prev", lag(col(stateCol), 1).over(byTime))
      .withColumn("__chg",
        when(col("__prev").isNull || col("__prev") =!= col(stateCol), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("__chg")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("version"))
      .agg(
        // all rows in a version carry the same state by construction
        min(col(stateCol)).as("state"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
      .select(col(keyCol), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_obs"))
  }
}
