package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: key-salting for skew and bucketed co-located
  * joins.
  *
  * AQE's skew-join splitting (on in GraftSession) handles most skew at
  * runtime by splitting oversized partitions; these helpers cover the
  * cases AQE can't: aggregation skew (a single hot group key) and
  * joins where one hot key floods a task even after splitting.
  */
object Scale {

  /** Two-phase aggregation for a skewed group key: salt the key into
    * `buckets` subkeys, pre-aggregate, then merge. Correct for any
    * algebraic aggregate expressed as (partial, merge) column pairs —
    * here specialized to the common sum/count shape.
    *
    * Example: `saltedSumCount(df, $"hot_key", $"x", 32)` ≡
    * `df.groupBy(hot_key).agg(sum(x), count(x))` with the hot key's
    * rows spread over 32 reducers in phase 1.
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      buckets: Int,
  ): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(sum(value).as("_psum"), count(value).as("_pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("cnt"))

  /** Salted broadcast-replicated join for a skewed fact→dim equi-join
    * where the dim is too big to broadcast whole but each key's dim
    * rows are small: replicate each dim row `buckets` times with an
    * explicit salt, salt the fact rows randomly, and join on
    * (key, salt) — the hot fact key now lands on `buckets` reducers.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      buckets: Int,
  ): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()), lit(buckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Enforces the documented scope of an all-pairs exactness baseline
    * (`q_dedup_embedding_cosine`, `q_embed_topk_brute`): count the
    * candidate side and REFUSE to build the O(n²) join past
    * `spark.graft.allPairsMaxRows` (default 100 000). The count is one
    * linear job over the returned (persisted) input — both join sides
    * reuse the cached columns, so the guard's scan is not wasted work —
    * versus the failure it prevents: a silent corpus² nested-loop join
    * that would run for days on a 10⁹-row table. Oversized inputs get
    * the blocked/IVF variant named in the error, not a best-effort try.
    */
  def requireAllPairsBounded(df: DataFrame, what: String): DataFrame = {
    val cap = df.sparkSession.conf
      .getOption("spark.graft.allPairsMaxRows").map(_.toLong).getOrElse(100000L)
    val cached = df.persist()
    val n = cached.count()
    require(n <= cap,
      s"$what is an all-pairs exactness baseline scoped to <= $cap rows " +
        s"(spark.graft.allPairsMaxRows); input has $n. Use the blocked " +
        "form (q_dedup_embedding_cosine_blocked) or the IVF index " +
        "(q_embed_topk_ivf*) at this scale.")
    cached
  }
}
