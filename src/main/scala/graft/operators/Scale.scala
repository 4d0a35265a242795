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
}
