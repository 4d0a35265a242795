package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Lineage.CutOps

/** PageRank over a directed edge list — the importance-scoring pass a
  * crawl/curation pipeline runs to weight sources (cf. Page et al.,
  * "The PageRank Citation Ranking"): seed-domain ranking, dedup-keeper
  * selection by authority, mixture weighting by graph centrality.
  *
  * All rank arithmetic is SCALED-INTEGER, like `Mixture`'s sampling
  * rates: ranks live at `scale` (default 10⁶), neighbor shares are
  * integer division `r div outdeg`, and the damping update is
  * `(15·scale)/100 + (85·Σshares)/100` in BIGINT. Integer ops make the
  * fixpoint bit-reproducible in ANY engine at ANY partitioning — sums
  * of longs commute, divisions truncate identically — which is what
  * lets a DuckDB oracle replay the same iterations and hash-match.
  * The float rank is `rank_scaled / scale` (callers divide at the
  * end); truncation error per update is < 1/scale per node.
  *
  * Scale shape, per iteration (the standard distributed PageRank):
  *   - shares: ranks ⋈ outdeg on node — two narrow tables, broadcast
  *     or co-partitioned;
  *   - contributions: edges ⋈ shares on src (the big equi-join — at
  *     100 TB this is THE shuffle, on the edge table's natural key),
  *     then sum by dst with map-side partial aggregation;
  *   - update: nodes ⟕ contributions, coalesce(0) for in-degree-0
  *     nodes (they keep the 15% teleport floor).
  * The rank table is O(|V|) and lineage-cut per round ([[Lineage]] —
  * eager localCheckpoint by default, reliable `checkpoint()` under
  * `spark.graft.graph.reliableCheckpoint`); the edge table and
  * out-degree table are cut ONCE before the loop so no round re-runs
  * the caller's upstream derivation. The loop is driver-side like
  * `Components.connectedComponents` / Lloyd's, with the per-round plan
  * fully distributed and its shuffles sized to |E|.
  */
object PageRank {

  /** (src, dst) directed edges → (node, rank_scaled) for every node
    * appearing in any edge, after `iters` damped iterations from a
    * uniform start of `scale` per node. Dangling nodes (out-degree 0)
    * contribute nothing (their mass leaks, the common simplification);
    * in-degree-0 nodes converge to the teleport floor 15%·scale.
    */
  def pagerank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000L,
  ): DataFrame = {
    require(iters >= 1, s"pagerank: iters ($iters) must be >= 1")
    val spark = edges.sparkSession
    // Materialize the edge derivation ONCE (eager lineage cut): `e` is
    // read every iteration by the contribution join, and `outdeg` /
    // `nodes` derive from it — without the cut, each of the `iters`
    // rounds re-runs the caller's full upstream plan (at 100 TB, the
    // source scan + distinct) twice. The cut also routes the loop
    // through the opt-in reliable-checkpoint path like the other
    // iterative graph operators ([[Lineage]]).
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .cutLineage()
    // size the loop's shuffles to the edge count, as in [[Components]]:
    // a small graph must not pay (default partitions) × (stages per
    // round) of empty-task scheduling; a big one gets the quotient back
    val nEdges = e.count()
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1L, math.min(prevParts.toLong, nEdges / 50000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .cutLineage()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst")))
        .distinct()
        .cutLineage()
      var ranks = nodes.select(col("node"), lit(scale).as("r"))
      for (_ <- 1 to iters) {
        val shares = ranks
          .join(outdeg, ranks("node") === outdeg("src"))
          .select(col("src"), expr("r div d").as("share"))
        val contribs = e
          .join(shares, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("share")).as("s"))
        // linear chain (ranks feeds exactly one input of the next
        // round's plan), so a plain cut suffices — no settle needed
        ranks = nodes
          .join(contribs, Seq("node"), "left")
          .select(
            col("node"),
            (lit(15L * scale / 100L) +
              expr("(85 * coalesce(s, 0)) div 100")).as("r"))
          .cutLineage()
      }
      ranks
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Personalized PageRank: the teleport mass restarts ONLY onto the
    * seed set (Haveliwala, "Topic-Sensitive PageRank"), so ranks
    * measure proximity to the seeds instead of global authority — the
    * "more like these" expansion primitive (seed-domain crawl
    * frontiers, trusted-source propagation, related-item retrieval).
    *
    * Same scaled-integer discipline as [[pagerank]]: r₀ = scale on
    * seeds / 0 elsewhere, update r' = is_seed·15%·scale +
    * (85·Σ r div d) div 100 — every iteration bit-reproducible, so the
    * oracle unrolls identically. Seed membership is resolved ONCE into
    * the persisted node table (one left join), not re-joined per
    * round; per-iteration cost is identical to global PageRank.
    */
  def personalized(
      edges: DataFrame,
      seeds: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000L,
  ): DataFrame = {
    require(iters >= 1, s"personalized: iters ($iters) must be >= 1")
    val spark = edges.sparkSession
    // same once-only edge materialization + |E|-sized loop shuffles as
    // [[pagerank]]; seed membership is folded into the cut node table,
    // so the loop never touches `seeds` again
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .cutLineage()
    val nEdges = e.count()
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1L, math.min(prevParts.toLong, nEdges / 50000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .cutLineage()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst")))
        .distinct()
        .join(seeds.select(col(seeds.columns.head).as("node"))
            .distinct().withColumn("__s", lit(1L)),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(0L)).as("is_seed"))
        .cutLineage()
      var ranks = nodes.select(col("node"), (col("is_seed") * scale).as("r"))
      for (_ <- 1 to iters) {
        val shares = ranks
          .join(outdeg, ranks("node") === outdeg("src"))
          .select(col("src"), expr("r div d").as("share"))
        val contribs = e
          .join(shares, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("share")).as("s"))
        ranks = nodes
          .join(contribs, Seq("node"), "left")
          .select(
            col("node"),
            (col("is_seed") * lit(15L * scale / 100L) +
              expr("(85 * coalesce(s, 0)) div 100")).as("r"))
          .cutLineage()
      }
      ranks
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
