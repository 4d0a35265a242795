package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Lineage.CutOps

/** Strongly connected components of a PER-ENTITY directed graph —
  * follows/links/citations, node domains that GROW with the corpus —
  * by Forward-Backward-Trim (Fleischer, Hendrickson & Pınar,
  * "On identifying strongly connected components in parallel", 2000;
  * engineering per Slota, Rajamanickam & Madduri, "BFS and
  * coloring-based parallel algorithms for strongly connected
  * components", IPDPS 2014). This is the corpus-scale complement of
  * [[GraphAlgos.sccCondensation]]: the condensation's V² path-doubling
  * closure is right for bounded type domains and REFUSES large ones;
  * this one never builds a reachability relation at all — every step
  * is an |E|-keyed equi-join, so a 10⁹-edge follows graph is as
  * shuffle-shaped as PageRank.
  *
  * The round structure, all subproblems advancing TOGETHER in one
  * plan (a `part` column carries the subproblem id, so "recurse on
  * the three remainders" is a groupBy, not driver-side fan-out):
  *
  *   1. TRIM to fixpoint: a node with no in-edge or no out-edge
  *      within its part is a singleton SCC (nothing can both reach
  *      and be reached by it) — assign and drop. Peeling cascades:
  *      DAG regions dissolve entirely here, one topological layer
  *      per iteration, which is what keeps pivot rounds for the
  *      cyclic cores only.
  *   2. PIVOT: each part's fnv63-MINIMAL node (node ties broken by
  *      id) — deterministic like a minimum (no RNG to disagree across
  *      engines/retries), but the pivot's POSITION in the part's
  *      condensation DAG is pseudo-random. That is the quicksort
  *      median argument: a plain min-node pivot degenerates on
  *      monotone-id SCC chains (the pivot always lands at one END, so
  *      each round peels exactly one SCC — rounds ≈ #SCCs), while the
  *      hashed pivot halves the chain in expectation — rounds
  *      O(log #SCCs) on ANY id assignment, adversarial included
  *      (spec-pinned on a 100-SCC monotone chain under default
  *      budgets).
  *   3. FW/BW: frontier BFS from the pivots along, then against, the
  *      within-part edges (the [[GraphAlgos.bfsLevels]] shape, all
  *      parts at once). SCC(pivot) = F ∩ B; scc_id = min(F ∩ B) —
  *      the component's minimum node, matching sccCondensation's
  *      convention (one extra part-keyed agg, since the hashed pivot
  *      is no longer itself the minimum).
  *   4. SPLIT: survivors fall into F∖B, B∖F, or neither; each
  *      (part, quadrant) group becomes a new part keyed by ITS
  *      minimum node. Edges between quadrants can never close a cycle
  *      (they'd have put both ends in F ∩ B), so confining the next
  *      round's BFS to within-part edges loses nothing.
  *
  * Convergence: every round assigns at least each active part's pivot
  * SCC, so the active set strictly shrinks; with hashed pivots a
  * C-SCC chain needs O(log C) rounds in expectation (each pivot lands
  * at a pseudo-random chain position and the split halves the part),
  * and `maxRounds` bounds the residual tail risk, failing loudly like
  * the other iterative operators. Per-round state (`active`, the BFS
  * visited sets, the assignment pieces) is settled via [[Lineage]]
  * and superseded rounds are [[Lineage.release]]d, so reliable-mode
  * checkpoint retention stays O(1) rounds.
  *
  * Returns (node, scc_id, scc_size) for EVERY node in the edge list —
  * including nodes whose only edges are self-loops (singletons).
  */
object SccEntity {

  def scc(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 30,
      maxBfsIters: Int = 300,
  ): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val raw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // node domain from the UNFILTERED edges (self-loop-only nodes are
    // singleton SCCs, not absentees); self-loops never change SCC
    // membership, so the traversal graph drops them
    val nodes = raw.select($"src".as("node")).union(raw.select($"dst"))
      .distinct()
    val e = raw.filter($"src" =!= $"dst").distinct().cutLineage()
    val nEdges = e.count()
    ScopedConf.withShufflePartitionsFor(spark, nEdges) {
      // assignment pieces accumulate settled; the union is collapsed
      // whenever it grows past a bounded width (the walks-accumulator
      // discipline — plan width must not scale with round count)
      val pieces = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      def flushPieces(): Unit = if (pieces.size > 16) {
        val merged = Lineage.settle(pieces.reduce(_ union _))
        pieces.foreach(Lineage.release)
        pieces.clear()
        pieces += merged
      }
      // every active subproblem is keyed by its MINIMUM node id.
      // Seed the partition from WEAKLY-connected components: disjoint
      // weak components advance through their own pivot rounds IN
      // PARALLEL instead of queueing through one global subproblem's
      // "neither" quadrant — on a corpus of k disconnected communities
      // that is the difference between max-rounds-per-community and
      // sum-over-communities. Nodes with no traversal edges
      // (self-loop-only) seed their own singleton parts.
      var active = Lineage.settle(
        if (nEdges == 0) nodes.select($"node", $"node".as("part"))
        else nodes.join(
          // star contraction, not min-label propagation: seeding must
          // not be the depth-limited step (a 200-node weak chain is 200
          // label rounds but O(log²) star rounds, same |E|-keyed plan)
          Components.connectedComponentsStar(e, "src", "dst")
            .select($"node", $"component".as("part")),
          Seq("node"), "left")
          .select($"node", coalesce($"part", $"node").as("part")))
      var activeCount = active.count()
      var round = 0
      while (activeCount > 0 && round < maxRounds) {
        round += 1
        // ---- trim to fixpoint: no in-edge or no out-edge ⇒ singleton
        var trimming = true
        while (trimming && activeCount > 0) {
          val ae = withinPartEdges(e, active)
          val outs = ae.select($"src".as("node")).distinct()
            .withColumn("has_out", lit(1L))
          val ins = ae.select($"dst".as("node")).distinct()
            .withColumn("has_in", lit(1L))
          val marked = Lineage.settle(active
            .join(outs, Seq("node"), "left")
            .join(ins, Seq("node"), "left")
            .select($"node", $"part",
              ($"has_out".isNotNull && $"has_in".isNotNull).as("keep")))
          Lineage.release(ae)
          val trimmed = marked.filter(!$"keep").select($"node")
          val nTrim = trimmed.count()
          if (nTrim == 0) {
            trimming = false
            Lineage.release(marked)
          } else {
            pieces += Lineage.settle(
              trimmed.select($"node", $"node".as("scc_id")))
            flushPieces()
            val nxt = Lineage.settle(
              marked.filter($"keep").select($"node", $"part"))
            Lineage.release(marked)
            Lineage.release(active)
            active = nxt
            activeCount -= nTrim
          }
        }
        if (activeCount > 0) {
          // ---- pivot FW/BW on the trimmed, cyclic remainder. Both
          // traversals run in ONE frontier loop over a direction-tagged
          // edge table — rounds = max(fw depth, bw depth) instead of
          // their sum, halving the loop's fixed per-job overhead (the
          // dominant cost at small-to-mid scale; at corpus scale the
          // joins are |E|-keyed either way).
          val ae = withinPartEdges(e, active)
          // hashed pivot (scaladoc step 2): one part-keyed map-side-
          // combinable agg; min_by on (hash, node) keeps determinism
          val pivots = active.groupBy($"part")
            .agg(min_by($"node", struct(
              graft.functions.Fnv63Hash.hash(spark, $"node".cast("string")),
              $"node")).as("node"))
            .select($"node", $"part")
          val fb = reachBoth(ae, pivots, maxBfsIters)
          val f = fb.filter($"d" === "f").select($"node", $"part")
          val b = fb.filter($"d" === "b").select($"node", $"part")
          val marked = Lineage.settle(active
            .join(f.withColumn("inf", lit(1L)), Seq("node", "part"), "left")
            .join(b.withColumn("inb", lit(1L)), Seq("node", "part"), "left")
            .select($"node", $"part",
              $"inf".isNotNull.as("inf"), $"inb".isNotNull.as("inb")))
          Seq(ae, fb).foreach(Lineage.release)
          // one shared (part, quadrant) min agg serves BOTH outputs:
          // the s-quadrant's min is the resolved SCC's id (the hashed
          // pivot is not itself the min), the other quadrants' mins
          // key the next round's parts
          val qm = marked.select($"node", $"part",
            when($"inf" && $"inb", lit("s")).when($"inf", lit("f"))
              .when($"inb", lit("b")).otherwise(lit("n")).as("q"))
          val np = qm.groupBy($"part", $"q").agg(min($"node").as("np"))
          val stamped = qm.join(np, Seq("part", "q"))
          pieces += Lineage.settle(stamped.filter($"q" === "s")
            .select($"node", $"np".as("scc_id")))
          flushPieces()
          val nxt = Lineage.settle(stamped.filter($"q" =!= "s")
            .select($"node", $"np".as("part")))
          Lineage.release(marked)
          Lineage.release(active)
          active = nxt
          activeCount = active.count()
        }
      }
      require(activeCount == 0,
        s"SccEntity.scc did not converge in $maxRounds rounds " +
          s"($activeCount nodes unassigned) — an unusually deep SCC " +
          "condensation chain; raise maxRounds")
      val assign =
        if (pieces.isEmpty) spark.emptyDataFrame
          .withColumn("node", lit(0L)).withColumn("scc_id", lit(0L)).limit(0)
        else pieces.reduce(_ union _)
      val sizes = assign.groupBy($"scc_id")
        .agg(count(lit(1)).as("scc_size"))
      assign.join(sizes, "scc_id").select($"node", $"scc_id", $"scc_size")
    }
  }

  /** Edges whose BOTH endpoints are active in the SAME part, stamped
    * with that part: two node-keyed equi-joins, settled (it feeds
    * several consumers in the round). Cross-part edges vanish — they
    * can never participate in a cycle again (see the SPLIT step).
    */
  private def withinPartEdges(e: DataFrame, active: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    Lineage.settle(e
      .join(active.select($"node".as("src"), $"part"), "src")
      .join(active.select($"node".as("dst"), $"part".as("p2")), "dst")
      .filter($"part" === $"p2")
      .select($"src", $"dst", $"part"))
  }

  /** Multi-source frontier BFS over the within-part edges, FORWARD AND
    * BACKWARD AT ONCE: the transpose traversal rides the same loop on
    * a direction-tagged edge table, so the visited set is keyed
    * (node, part, d) with d ∈ {f, b} and the round count is
    * max(fw depth, bw depth), not their sum. Per round one equi-join +
    * distinct + anti-join ([[GraphAlgos.bfsLevels]]'s shape), lineage
    * settled, superseded rounds released.
    */
  private def reachBoth(
      ae: DataFrame,
      pivots: DataFrame,
      maxIters: Int,
  ): DataFrame = {
    val spark = ae.sparkSession
    import spark.implicits._
    val step = Lineage.settle(
      ae.select($"src".as("node"), $"dst".as("next"), $"part", lit("f").as("d"))
        .union(ae.select($"dst".as("node"), $"src".as("next"), $"part",
          lit("b").as("d"))))
    var visited = Lineage.settle(pivots.select($"node", $"part")
      .crossJoin(spark.createDataset(Seq("f", "b")).toDF("d")))
    var frontier = visited
    var n = frontier.count()
    var i = 0
    while (n > 0 && i < maxIters) {
      i += 1
      val nxt = Lineage.settle(frontier
        .join(step, Seq("node", "part", "d"))
        .select($"next".as("node"), $"part", $"d").distinct()
        .join(visited, Seq("node", "part", "d"), "left_anti"))
      n = nxt.count()
      if (n > 0) {
        val merged = Lineage.settle(visited.union(nxt))
        Lineage.release(visited)
        if (frontier ne visited) Lineage.release(frontier)
        visited = merged
        frontier = nxt
      } else Lineage.release(nxt)
    }
    require(n == 0,
      s"SccEntity.reachBoth did not drain in $maxIters frontier rounds — " +
        "graph diameter exceeds the budget; raise maxBfsIters")
    if (frontier ne visited) Lineage.release(frontier)
    Lineage.release(step)
    visited
  }
}
