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
