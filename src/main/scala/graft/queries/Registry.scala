package graft.queries

/** All verifiable queries the engine exposes, in one place. SparkEntry
  * derives both the `queries` map and the `oracleSql` map from this, so
  * a query and its oracle can never drift apart.
  */
object Registry {
  def all: Seq[Q] = {
    val qs = Relational.all ++ Replay.all ++ Dedup.all ++ Similarity.all ++
      TextAnalysisQ.all ++ MultimodalQ.all ++ Curation.all ++ Temporal.all ++
      Lake.all ++ Analytic.all ++ Graph.all ++ TextFilters.all ++ Linkage.all ++
      TimeSeries.all ++ Quantize.all ++ TextSpans.all ++ MlEvalQ.all
    // a duplicate name would silently DROP a query when the seq
    // collapses into the maps below — fail loudly instead
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate gate query names: ${dups.mkString(", ")}")
    qs
  }

  def queriesMap: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
