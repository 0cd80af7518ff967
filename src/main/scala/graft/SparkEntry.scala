package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All engine capabilities are organized as [[QueryPack]]s; this object
  * merges them into the flat `queries` / `oracleSql` maps the driver's
  * verify + bench harnesses iterate.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    analytics.Relational,
    analytics.RelationalExt,
    analytics.SqlFacadeQueries,
    analytics.GraphQueries,
    analytics.Dashboard,
    analytics.Temporal,
    analytics.SequenceQueries,
    analytics.StatsQueries,
    analytics.SupplyQueries,
    analytics.WarehouseQueries,
    analytics.InsightQueries,
    etl.EtlQueries,
    llm.TextQueries,
    llm.CorpusQueries,
    llm.DedupQueries,
    llm.SimilarityQueries,
    llm.RetrievalQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Lazy: the
    * packs instantiate once (Bench looks names up inside its timed
    * region — rebuilding the map per lookup would be timing noise).
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = packs.flatMap(_.qs.map(_.name))
    val dups = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    // a silent toMap collision would un-register a query and zero its
    // correctness row — fail loudly instead
    require(dups.isEmpty, s"duplicate query names across packs: $dups")
    packs.flatMap(_.queries).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  lazy val oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap

  /** Queries timed by [[Bench]] (the representative/expensive subset). */
  lazy val headlineNames: Seq[String] =
    packs.flatMap(_.qs).filter(_.headline).map(_.name)
}
