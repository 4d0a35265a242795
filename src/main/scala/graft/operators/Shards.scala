package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + shard assignment — how a curated
  * corpus becomes training shards: every row gets a content-independent
  * pseudo-random order key (md5 of its id) and a shard id derived from
  * that key. Ordering by `(shard, okey)` is a reproducible global
  * permutation of the corpus, yet no stage ever global-sorts: shard
  * balance comes from hash uniformity (not a row_number over one
  * partition — the classic scale-killer this operator avoids), and
  * each shard sorts locally at write time.
  */
object Shards {

  /** Attach `okey` (md5 permutation key) and `shard` (top 24 bits of
    * the key mod `nShards`). Narrow map, zero shuffle; any engine
    * recomputes the identical assignment, so a re-run or a downstream
    * job can re-derive shard membership without reading the shards.
    */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("okey", md5(col(idCol).cast("string")))
      .withColumn("shard",
        conv(substring(col("okey"), 1, 6), 16, 10).cast("long") % nShards)

  /** Leakage-safe train/eval assignment: the split key is a GROUP id
    * (canonically the near-duplicate cluster from
    * [[Components.connectedComponents]]), not the document id — so a
    * near-dup pair can never straddle train and eval, which is the
    * eval-contamination failure mode a doc-hash split silently has.
    * `evalPerMille` of the group-hash space goes to eval. Narrow map
    * over rows already carrying their group id; the determinism
    * contract is the same as [[assign]] (any engine re-derives
    * membership without reading the split).
    */
  def splitByGroup(df: DataFrame, groupCol: String, evalPerMille: Int): DataFrame = {
    require(evalPerMille >= 0 && evalPerMille <= 1000,
      s"evalPerMille out of range: $evalPerMille")
    df.withColumn("split",
      when(
        conv(substring(md5(col(groupCol).cast("string")), 1, 6), 16, 10)
          .cast("long") % 1000L < evalPerMille,
        lit("eval")).otherwise(lit("train")))
  }

  /** Writer shape: one partition per shard, rows in permutation order
    * within it — `partitionBy`-ready. The single shuffle keys on the
    * shard id; the sort is local to each shard partition.
    */
  def shuffled(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    assign(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("okey"))
}
