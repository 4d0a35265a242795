package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, explode}

/** Shared column idioms. */
object Cols {

  /** Materialize an expression through a Generate boundary:
    * `explode(array(e))` yields exactly one row whose value is `e`,
    * and CollapseProject cannot inline an alias through a Generate —
    * so downstream consumers reference the computed value instead of
    * re-evaluating the expression per consumer. Use for expensive
    * aliases (tokenizations, digest arrays, regex counts) that more
    * than one downstream expression reads; measured 10-50× on hot
    * paths (see ARCHITECTURE.md "Lessons encoded in the code").
    */
  def materialized(e: Column): Column = explode(array(e))
}
