package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a query (and, where ANSI-SQL
  * expressible, a DuckDB oracle) via the [[graft.queries.Q]] catalog. */
object SparkEntry {

  /** The full query catalog. */
  def catalog: Seq[Q] =
    Relational.all ++ GeoPipeline.all ++ TextQueries.all ++ DedupQueries.all ++
      VectorQueries.all ++ MultimodalQueries.all ++ JoinQueries.all ++
      CurationQueries.all ++ SourceQueries.all ++ MixQueries.all ++
      AnalyticQueries.all ++ AdvancedQueries.all ++ ParityQueries.all ++
      TpchQueries.all ++ PartsuppQueries.all ++ TpchFinalQueries.all ++
      TimeSeriesQueries.all ++ GraphQueries.all ++ SketchQueries.all ++
      BehaviorQueries.all ++ FuzzQueries.all ++ EvalQueries.all ++
      LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * zone_report is the widest end-to-end slice (scan → geo argmin →
    * calendar funcs → pivot → windows → multi-join). */
  def entry(spark: SparkSession): DataFrame =
    GeoPipeline.zoneReport.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * CACHE CONTRACT (ADVICE r18): several query builders `persist()` an
    * intermediate that is consumed more than once inside the same plan
    * (or shields a kernel from the range-sampler's double execution); the
    * persists are invocation-scoped by convention, not unpersisted by the
    * builder — the returned DataFrame still references them. Callers that
    * run many queries in one session MUST drop them between invocations
    * with `spark.catalog.clearCache()` (exactly what `graft.Bench`,
    * `graft.Verify` and the test harness do); a long-lived session that
    * skips this accumulates cache entries across invocations. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> ((s: SparkSession, dir: String) => q.run(s, dir))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
