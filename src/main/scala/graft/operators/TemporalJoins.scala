package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins the DataFrame API lacks as primitives, built the
  * way they must be built at 100 TB — as ONE keyed shuffle, never a
  * per-row subquery or an inequality nested loop.
  *
  * The reference's data model is exactly the shape these serve: its
  * analytics take "the latest BBO state at each point in time"
  * (`notebooks/bbo.ipynb` resample().last() is the 1-minute-grid
  * special case of an as-of join), and its hourly-file / time-range
  * logic (`cli/src/file_reader.rs:93-99`) is interval-overlap
  * — the range-join shape.
  */
object TemporalJoins {

  /** AS-OF JOIN: for every left row, attach the single latest right
    * row of the same key with `right.ts <= left.ts` (inner: left rows
    * with no prior right row drop; left: they keep nulls).
    *
    * Physical shape: tag both sides, UNION, one window over
    * (key, ts, side) carrying the last non-null right payload forward
    * — a single hash-partition shuffle on the key plus an in-partition
    * sort, both spillable, linear in |left| + |right|. Equal
    * timestamps resolve right-before-left, so a right row AT the left
    * row's timestamp is matched ("at or before"), like DuckDB/kdb
    * ASOF. The right side must be unique per (key, ts) for the result
    * to be well-defined — same precondition every ASOF engine has.
    *
    * Column contract: `keys` and `tsCol` must exist on both sides
    * with identical names; remaining column names must not collide.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      how: String = "inner",
      direction: String = "backward",
  ): DataFrame = {
    require(how == "inner" || how == "left", s"asOfJoin: unsupported how=$how")
    require(direction == "backward" || direction == "forward",
      s"asOfJoin: unsupported direction=$direction")
    // relational join semantics: NULL keys and NULL right timestamps
    // match nothing. Without the key filter the window would group
    // null-key rows together and "join" them; without the ts filter a
    // null-ts right row sorts FIRST in the window and would carry into
    // every later left row — but `q.ts <= t.ts` is never true for
    // NULL in any ASOF engine.
    val rightNonNull = (keys :+ tsCol)
      .foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
    val leftFiltered =
      if (how == "inner") keys.foldLeft(left)((df, k) => df.filter(col(k).isNotNull))
      else left // left mode: null-key rows survive with null payload
    val lCols = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val rCols = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    require(rCols.nonEmpty, "asOfJoin: right side has no payload columns")
    val overlap = lCols.intersect(rCols)
    require(overlap.isEmpty, s"asOfJoin: colliding payload columns $overlap")
    // fail fast on collisions with the rewrite's internal helper names —
    // an input column named e.g. __side would otherwise silently corrupt
    // the union/window logic instead of erroring
    val reserved = (left.columns ++ right.columns).toSeq
      .intersect(Seq("__side", "__l", "__r", "__last_r", "__unit"))
    require(reserved.isEmpty,
      s"asOfJoin: input columns collide with reserved helper names $reserved")
    val keyCols = keys.map(col)
    def payloadType(df: DataFrame, cols: Seq[String]): StructType =
      StructType(cols.map(c => df.schema(c)))
    val lu = leftFiltered.select(
      keyCols ++ Seq(
        col(tsCol),
        lit(1).as("__side"),
        (if (lCols.nonEmpty) struct(lCols.map(col): _*)
         else struct(lit(1).as("__unit"))).as("__l"),
        lit(null).cast(payloadType(right, rCols)).as("__r"),
      ): _*)
    val ru = rightNonNull.select(
      keyCols ++ Seq(
        col(tsCol),
        lit(0).as("__side"),
        lit(null).cast(
          if (lCols.nonEmpty) payloadType(left, lCols)
          else StructType(Seq(org.apache.spark.sql.types.StructField(
            "__unit", org.apache.spark.sql.types.IntegerType)))).as("__l"),
        struct(rCols.map(col): _*).as("__r"),
      ): _*)
    // backward: "latest right at-or-BEFORE" — ascending time, carry
    // the last right forward. forward: "earliest right at-or-AFTER" —
    // the mirror image, DESCENDING time with the same carry (walking
    // back from the future, the last right seen is the next one
    // ahead). Either way, right-before-left at equal ts keeps the
    // "at-or-…" tie rule; the single-shuffle shape is unchanged.
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(
        (if (direction == "backward") col(tsCol).asc else col(tsCol).desc),
        col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ru.unionByName(lu)
      .withColumn("__last_r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val filtered =
      if (how == "inner") joined.filter(col("__last_r").isNotNull) else joined
    filtered.select(
      keyCols ++ Seq(col(tsCol)) ++
        lCols.map(c => col("__l").getField(c).as(c)) ++
        rCols.map(c => col("__last_r").getField(c).as(c)): _*)
  }

  /** RANGE JOIN (interval × point) without an inequality nested loop:
    * points land in `floor(ts / binWidth)` bins; each interval
    * replicates to every bin it overlaps; bins EQUI-join; the exact
    * predicate `lo <= ts <= hi` refines. Shuffle volume is
    * |points| + |intervals| × (span/binWidth + 1) — pick binWidth
    * around the typical interval span so replication stays ~2×. This
    * is the standard distributed range-join strategy; the naive
    * formulation (`points.join(intervals, ts between lo and hi)`)
    * plans as a broadcast nested loop, which is quadratic work at
    * scale.
    *
    * `tsCol`/`loCol`/`hiCol` must be numeric (epoch units).
    */
  def rangeJoinBinned(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long,
  ): DataFrame = {
    require(binWidth > 0, "rangeJoinBinned: binWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "rangeJoinBinned: input columns collide with reserved helper name __bin")
    val pb = points.withColumn("__bin", floor(col(tsCol) / binWidth))
    val ib = intervals.withColumn(
      "__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    pb.join(ib, "__bin")
      .filter(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join as a binned equi-join — the
    * two-sided generalization of [[rangeJoinBinned]] (campaign ×
    * incident windows, session × outage, ad flight × content
    * schedule). Each side explodes to the bins its interval touches
    * and pairs meet on equal bin; a pair that shares k bins would
    * surface k times, so it is KEPT ONLY in the first bin both occupy
    * (`bin == max(floor(lLo/W), floor(rLo/W))`) — emit-once without a
    * distinct, i.e. no second shuffle — then the exact predicate
    * `lLo ≤ rHi ∧ rLo ≤ lHi` verifies the overlap. Shuffle volume is
    * rows × (span/W + 1) per side; pick `binWidth` ≈ the typical span
    * so the blow-up is ≤ 2× and no bin key is hot. Column names must
    * be disjoint across the two sides.
    */
  def intervalOverlapJoinBinned(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      binWidth: Long,
  ): DataFrame = {
    require(binWidth > 0, "intervalOverlapJoinBinned: binWidth must be positive")
    require(!(left.columns ++ right.columns).contains("__bin"),
      "intervalOverlapJoinBinned: input columns collide with reserved helper name __bin")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "intervalOverlapJoinBinned: side column names must be disjoint")
    def bins(df: DataFrame, lo: String, hi: String) = df.withColumn(
      "__bin",
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    bins(left, lLo, lHi).join(bins(right, rLo, rHi), "__bin")
      .filter(col("__bin") ===
        greatest(floor(col(lLo) / binWidth), floor(col(rLo) / binWidth)))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .drop("__bin")
  }
}
