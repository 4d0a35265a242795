package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped `spark.sql.shuffle.partitions` override for the iterative
  * operators (graph loops, SCC, PageRank, components): each loop sizes
  * its per-round shuffles to its OWN working set — `rows / 50k + 1`,
  * clamped to the session default — because a 32-partition shuffle of
  * a 200-row frontier is 31 empty tasks per round, 20+ rounds deep.
  *
  * SINGLE-QUERY ASSUMPTION (documented, deliberate): Spark's runtime
  * SQL conf is SESSION-scoped, so the override is visible to any query
  * that plans on the same `SparkSession` while `body` runs, and the
  * restore races interleaved overrides. Every `SparkEntry.queries`
  * entry runs alone (driver protocol: one query at a time), so this is
  * safe for the gates and the bench. A caller that interleaves
  * concurrent queries on one session should isolate the loop on
  * `spark.newSession()` (shares the SparkContext and catalog, clones
  * the conf) and pass THAT session's frames in — the helper then scopes
  * the override to the clone.
  */
object ScopedConf {
  private val Key = "spark.sql.shuffle.partitions"

  /** Run `body` with shuffle partitions set to
    * `clamp(rows / rowsPerPartition + 1, 1, session default)`,
    * restoring the previous value afterwards (also on failure).
    */
  def withShufflePartitionsFor[T](
      spark: SparkSession,
      rows: Long,
      rowsPerPartition: Long = 50000L,
  )(body: => T): T = {
    val prev = spark.conf.get(Key)
    val parts = math.max(1L, math.min(prev.toLong, rows / rowsPerPartition + 1L))
    spark.conf.set(Key, parts.toString)
    try body finally spark.conf.set(Key, prev)
  }
}
