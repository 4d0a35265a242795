package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Length-bucketed batch planning — the padding-efficiency stage
  * between tokenization and training. Fixed-shape batches pad every
  * sequence to the batch's longest member; batching a mixed-length
  * corpus against one global sequence length wastes
  * `1 − mean/max` of every batch on pad tokens. Grouping documents
  * into length buckets first (boundaries from the MERGEABLE histogram
  * quantile sketch — no global sort at any scale) caps the
  * within-batch length spread, and the plan report quantifies the
  * win: the gate query's hash-matched output carries per-bucket AND
  * unbucketed padding efficiency side by side.
  *
  * Scale shape: bucket boundaries come from `Sketches.histogramQuantiles`
  * (one map-side-combined groupBy over ≤ bins cells, then a bounded
  * driver fetch of the quantile rows — the same model-parameter pull
  * as k-means centroids); bucket assignment is a narrow when-chain;
  * the report is ONE groupBy over ≤ buckets+1 groups. Nothing in the
  * plan depends on corpus size except the linear token-count scan.
  */
object Batching {

  /** Batch-plan report over per-document token counts.
    *
    * @param tokens       (id, t) — one row per document, t = token count
    * @param bounds       ascending bucket upper-bounds; docs with
    *                     t ≤ bounds(i) (and > bounds(i-1)) land in
    *                     bucket i, the rest in bucket bounds.size
    * @param batchBudget  token budget per fixed-shape batch
    * @return one row per bucket plus a `bucket = -1` unbucketed
    *         baseline: (bucket, n_docs, seq_len, total_tokens,
    *         padded_tokens, batch_docs, n_batches, efficiency)
    */
  def lengthBucketedPlan(
      tokens: DataFrame,
      bounds: Seq[Long],
      batchBudget: Long,
  ): DataFrame = {
    // duplicate bounds (coinciding quantiles on a narrow distribution)
    // are tolerated: the later when-branch never fires and its bucket
    // is simply empty — same semantics as the oracle's CASE chain
    require(bounds.nonEmpty && bounds == bounds.sorted,
      s"lengthBucketedPlan: bounds must be ascending, got $bounds")
    require(batchBudget >= 1, s"lengthBucketedPlan: batchBudget >= 1")
    val t = col("t")
    val bucketCol: Column = bounds.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, (b, i)) =>
        Some(acc.fold(when(t <= b, i))(_.when(t <= b, i)))
      }
      .get
      .otherwise(bounds.size)
    val byBucket = tokens
      .select(bucketCol.cast("long").as("bucket"), t)
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(t).cast("long").as("seq_len"),
        sum(t).cast("long").as("total_tokens"))
    val baseline = tokens
      .agg(
        count(lit(1)).as("n_docs"),
        max(t).cast("long").as("seq_len"),
        sum(t).cast("long").as("total_tokens"))
      .select(lit(-1L).as("bucket"),
        col("n_docs"), col("seq_len"), col("total_tokens"))
    byBucket.unionByName(baseline)
      // a bucket whose docs all have t = 0 would make batchBudget /
      // seq_len Infinity and efficiency 0/0 = NaN; degenerate token
      // counts are a broken upstream tokenizer, so fail LOUDLY in the
      // plan (no extra validation job) instead of emitting garbage rows
      .withColumn("seq_len",
        when(col("seq_len") >= 1, col("seq_len"))
          .otherwise(raise_error(concat(
            lit("lengthBucketedPlan: bucket "), col("bucket").cast("string"),
            lit(" has seq_len 0 — token counts must be >= 1")))))
      .select(
        col("bucket"), col("n_docs"), col("seq_len"), col("total_tokens"),
        (col("n_docs") * col("seq_len")).as("padded_tokens"),
        greatest(floor(lit(batchBudget) / col("seq_len")), lit(1L))
          .cast("long").as("batch_docs"))
      .withColumn("n_batches",
        ceil(col("n_docs").cast("double") / col("batch_docs")).cast("long"))
      .withColumn("efficiency",
        round(col("total_tokens").cast("double") / col("padded_tokens"), 4))
      .orderBy(col("bucket"))
  }
}
