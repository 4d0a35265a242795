package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *   - every computed/aggregated column is aliased identically on both
  *     sides (the compare sorts columns by name);
  *   - every query ends in an explicit total order (ties broken by a
  *     unique key) so row order is stable;
  *   - floating-point aggregates are rounded (sums of 2-dp money to 2
  *     dp, ratios/averages to 4 dp) so last-bit accumulation-order
  *     differences between engines can't flip the hash.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

/** Plan-level fixture-assumption guards. Synthetic-id gate queries
  * (q_dedup_incremental, q_corpus_diff) plant rows at `doc_id +
  * offset` and later reconstruct membership as `doc_id >= offset`;
  * if the documents fixture ever grew ids past the offset, Spark and
  * the oracle would misclassify IDENTICALLY — the hash gate cannot
  * detect its own broken assumption. Wrapping the source id here makes
  * the assumption fail LOUDLY at execution time, inside the plan (no
  * extra validation job), the moment it is violated.
  */
object Fixture {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def idBelow(id: Column, offset: Long, what: String): Column =
    when(id < offset, id).otherwise(raise_error(concat(
      lit(s"$what: fixture doc_id "), id.cast("string"),
      lit(s" >= synthetic-id offset $offset — planted-row membership " +
        "reconstruction would silently misclassify in BOTH engines"))))
}
