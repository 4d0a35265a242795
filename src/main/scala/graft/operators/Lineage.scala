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

  /** Reliable-checkpoint RETENTION: Spark never deletes a reliable
    * checkpoint on its own (cleanup needs
    * `spark.cleaner.referenceTracking.cleanCheckpoints`, a
    * context-creation-time conf that is GC-driven and best-effort
    * anyway), so a 60-round loop would retain all 60 rounds' state in
    * the checkpoint dir. [[cut]] therefore records the `rdd-*`
    * directory each reliable checkpoint lands in (weakly keyed by the
    * returned frame), and the iterative operators call [[release]] on
    * a round's state the moment the NEXT round's state has
    * materialized — steady-state disk is ~2 rounds plus the loop's
    * static tables, not the whole trajectory. Frames never released
    * (the final result, the static tables) keep their files until the
    * checkpoint dir itself is cleaned, which is documented behavior:
    * their lifetime is the caller's, not the loop's.
    */
  private val tracked = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, String]())

  /** SINGLE-WRITER ASSUMPTION (deliberate, documented): the rdd-* dir
    * attribution below diffs the checkpoint directory listing around
    * the eager materialization, serialized under this object's lock —
    * which covers every cut() in THIS JVM, but not another driver
    * checkpointing into the SAME directory concurrently (its fresh
    * rdd-* dirs would be mis-attributed here, and release() could then
    * delete a foreign checkpoint). One driver per checkpoint dir is
    * the operating rule — the natural deployment anyway, since
    * SparkContext.setCheckpointDir is context-global. Multi-driver
    * setups namespace the dir per driver (e.g. suffix the
    * applicationId) via [[DirKey]]. release() only ever deletes paths
    * this map attributed (spec-pinned), so the failure mode without
    * namespacing is bounded to the shared directory, never arbitrary
    * paths.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (!reliable) df.localCheckpoint(eager = true)
    else Lineage.synchronized {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirKey).getOrElse(throw new IllegalArgumentException(
          s"$ReliableKey=true needs $DirKey (a fault-tolerant path — " +
            "HDFS/object store on a cluster) or a pre-set " +
            "SparkContext.setCheckpointDir"))
        sc.setCheckpointDir(dir)
      }
      // identify the checkpoint's rdd-* directory by diffing the
      // checkpoint dir around the (eager) materialization — the
      // Dataset API doesn't expose the checkpointed RDD. cut() is
      // serialized under the object lock in reliable mode, so the
      // fresh entry is unambiguous.
      val ckDir = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
      val fs = ckDir.getFileSystem(sc.hadoopConfiguration)
      def rdds(): Set[String] =
        if (!fs.exists(ckDir)) Set.empty[String]
        else fs.listStatus(ckDir).map(_.getPath.getName).toSet
      val before = rdds()
      val out = df.checkpoint(eager = true)
      (rdds() -- before).foreach { fresh =>
        tracked.put(out, new org.apache.hadoop.fs.Path(ckDir, fresh).toString)
      }
      out
    }
  }

  /** Delete the reliable-checkpoint files behind a SUPERSEDED loop
    * state (see retention note on [[tracked]]). Only frames produced
    * by [[cut]]/[[settle]] in reliable mode have files to release;
    * anything else (localCheckpoint mode, derived projections) is a
    * no-op — safe to call unconditionally in a loop. The caller
    * asserts the frame is dead: nothing may lazily read it afterwards.
    */
  def release(df: DataFrame): Unit =
    Option(tracked.remove(df)).foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      fs.delete(path, true)
      ()
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
    val out = m.sparkSession.createDataFrame(m.rdd, m.schema)
    // transfer checkpoint-file ownership to the frame the caller holds,
    // so release(settledFrame) finds the files
    Option(tracked.remove(m)).foreach(tracked.put(out, _))
    out
  }

  /** `.cutLineage()` postfix form — drop-in for `.localCheckpoint(true)`. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = cut(df)
    def settleLineage(): DataFrame = settle(df)
  }
}
