package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-round lineage cut for the iterative graph loops (bfsLevels,
  * sssp, coreNumbers, kCore, anf, labelProp, Components, walks).
  *
  * Default: eager `localCheckpoint` — materialize to executor-local
  * storage and truncate the plan, the right call in local mode and on
  * healthy clusters (no distributed-FS round trip per iteration).
  * LOCAL checkpoint blocks are NOT fault-tolerant though: on a real
  * cluster, losing an executor mid-loop loses blocks that nothing can
  * recompute (the lineage was cut), and the job aborts.
  *
  * `spark.graft.graph.reliableCheckpoint=true` opts a long loop into
  * RELIABLE `checkpoint()` against a fault-tolerant directory
  * (`spark.graft.graph.checkpointDir`, or a SparkContext checkpoint
  * dir set by the caller): executor loss then re-reads the round's
  * state from the checkpoint store instead of aborting — executor
  * loss costs a re-read, not the whole 20-round iteration.
  */
object Lineage {
  val ReliableKey = "spark.graft.graph.reliableCheckpoint"
  val DirKey = "spark.graft.graph.checkpointDir"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (!reliable) df.localCheckpoint(eager = true)
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirKey).getOrElse(throw new IllegalArgumentException(
          s"$ReliableKey=true needs $DirKey (a fault-tolerant path — " +
            "HDFS/object store on a cluster) or a pre-set " +
            "SparkContext.setCheckpointDir"))
        sc.setCheckpointDir(dir)
      }
      df.checkpoint(eager = true)
    }
  }

  /** [[cut]] + drop ALL plan metadata by re-wrapping the materialized
    * RDD in a fresh logical relation: fresh exprIds, no propagated
    * constraints, and — critically — no ORIGIN STATS. A checkpointed
    * Dataset's LogicalRDD keeps its origin plan's `sizeInBytes`
    * estimate; in a loop whose round-r state is built from TWO
    * descendants of round r−1 (coreNumbers: `cur` patched with
    * `changed`, both derived from the previous `cur`), those BigInt
    * estimates MULTIPLY — the estimate's bit-length triples per round
    * and by round 15 the driver spends minutes per round inside
    * BigInteger ToomCook multiplication during stats estimation.
    * Re-wrapping resets the estimate to the default constant, so
    * per-round planning cost stays flat. Use for any loop state that
    * feeds MORE than one input of the next round's plan; plain [[cut]]
    * (which keeps partitioning metadata) is fine for linear chains.
    */
  def settle(df: DataFrame): DataFrame = {
    val m = cut(df)
    m.sparkSession.createDataFrame(m.rdd, m.schema)
  }

  /** `.cutLineage()` postfix form — drop-in for `.localCheckpoint(true)`. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
    def settleLineage(): DataFrame = settle(df)
  }
}
