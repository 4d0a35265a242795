package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Entity resolution / record linkage over the customer dimension —
  * the structured-data twin of document dedup: blocking to bound the
  * comparison space, an edit-distance match predicate, then connected-
  * component canonicalization so transitive matches collapse to one
  * entity. The reference's asset→outcome dim maintenance implies the
  * same problem one level up (a dim rebuilt from multiple pulls must
  * reconcile re-listed entities); at training-data scale this is how
  * author/source/license records are reconciled before per-entity caps
  * (q_pipeline_domain_cap) apply.
  */
object Linkage {

  /** Blocking + Levenshtein verification + CC canonicalization. The
    * corpus is customer plus PLANTED perturbed re-registrations (every
    * 23rd record re-appears with `#`→`-` in the name — edit distance
    * exactly 1 — under a shifted id), the match rule is
    * levenshtein ≤ 1 WITHIN a (nation, name-suffix) block, and
    * entities are the connected components (min-label canonical, the
    * q_dedup_canonical machinery). Natural collisions — two real
    * customers one digit apart in the same block — are part of the
    * gated surface: both engines must agree on every edge AND on the
    * transitive closure, which the oracle recomputes via its own
    * recursive fixpoint, never trusting Spark's.
    *
    * Scale shape: candidate generation is an equi-join on the block
    * key (never record×record); block sizes are bounded by the key's
    * fan-in (at 100 TB add the df-cap guard the LSH band path uses);
    * the quadratic levenshtein verify runs only within blocks. CC is
    * the O(log n)-round min-label loop.
    */
  private val linkRecords = Q(
    "q_link_records",
    (s, dir) => {
      import s.implicits._
      val base = Tables(s, dir).customer
        .select(Fixture.idBelow($"c_custkey", 10000000L, "q_link_records").as("id"),
          $"c_name".as("name"), $"c_nationkey".as("nat"))
      val planted = base.filter($"id" % 23 === 5)
        .select(($"id" + 10000000L).as("id"),
          translate($"name", "#", "-").as("name"), $"nat")
      val recs = base.unionByName(planted)
      val blocked = recs.withColumn("blk",
        concat($"nat".cast("string"), lit("|"), substring($"name", -3, 3)))
      val pairs = blocked.as("a").join(blocked.as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
        .filter(levenshtein(col("a.name"), col("b.name")) <= 1)
        .select(col("a.id").as("src"), col("b.id").as("dst"))
      val comp = graft.operators.Components
        .connectedComponents(pairs, "src", "dst")
      val ent = recs.select($"id")
        .join(comp.select($"node".as("id"), $"component"), Seq("id"), "left")
        .select($"id", coalesce($"component", $"id").as("entity_id"))
      val sizes = ent.groupBy($"entity_id").agg(count(lit(1)).as("n_records"))
      ent.join(sizes, "entity_id")
        .select($"id", $"entity_id", $"n_records")
        .orderBy($"id")
    },
    Some("""WITH RECURSIVE base AS (
           |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat FROM customer
           |  UNION ALL
           |  SELECT c_custkey + 10000000, replace(c_name, '#', '-'), c_nationkey
           |  FROM customer WHERE c_custkey % 23 = 5
           |),
           |blk AS (
           |  SELECT id, name,
           |         CAST(nat AS VARCHAR) || '|' || substr(name, -3, 3) AS blk
           |  FROM base
           |),
           |pairs AS (
           |  SELECT a.id AS src, b.id AS dst
           |  FROM blk a JOIN blk b ON a.blk = b.blk AND a.id < b.id
           |  WHERE levenshtein(a.name, b.name) <= 1
           |),
           |edges AS (
           |  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
           |),
           |walk(node, comp) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
           |),
           |comp AS (
           |  SELECT node AS id, min(comp) AS entity_id FROM walk GROUP BY node
           |),
           |ent AS (
           |  SELECT b.id, coalesce(c.entity_id, b.id) AS entity_id
           |  FROM base b LEFT JOIN comp c USING (id)
           |),
           |sizes AS (
           |  SELECT entity_id, count(*) AS n_records FROM ent GROUP BY entity_id
           |)
           |SELECT e.id, e.entity_id, s.n_records
           |FROM ent e JOIN sizes s USING (entity_id)
           |ORDER BY e.id""".stripMargin),
  )

  val all: Seq[Q] = Seq(linkRecords)
}
