package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Robustness gate: every catalog query against EMPTY twins of the test
  * tables (same schemas, zero rows). Empty partitions / date windows are
  * everyday inputs at 100 TB; an operator must degrade to an empty result,
  * or fail with a deliberate, clearly-worded IllegalArgumentException —
  * never an obscure crash from deep inside a plan. */
class EmptyInputSpec extends SparkSpec {

  // queries whose semantics REQUIRE a non-empty dimension: enriching
  // against an empty zone dim is an upstream config error and must fail
  // loudly (silent NULL zones would poison every downstream mart)
  private val requiresZoneDim = Set("geo_enrich", "geo_enrich_partitioned",
    "recommendations", "recommendations_grid", "recommendations_grid_full",
    "user_act_city", "user_city_mart",
    "user_home_city", "user_travel", "zone_report")

  // global aggregates (no GROUP BY): one row over empty input is standard
  // SQL semantics — DuckDB returns the same single null-sum row
  private val globalAggOneRow = Set("q6_forecast_revenue", "q_tpch_q14",
    "q_tpch_q17", "q_tpch_q19", "q_funnel_conversion", "q_kmv_union",
    "q_join_size_est", "q_skew_stats", "q_seq_match",
    "q_kmv_intersect", "q_auc_score", "q_cohen_kappa", "q_lsh_recall",
    "q_embedding_lsh_recall",
    "q_lsh_recall_sampled", "q_embedding_lsh_recall_sampled",
    "q_dataset_datasheet", "q_window_funnel", "q_graph_assortativity",
    "q_gini_concentration")

  // queries whose output is sized by a deployment CONSTANT (a probe list,
  // a profiled-column list), not by the data: they legitimately return
  // that many zero-count rows from empty input
  private val constantRows = Map("q_cms_heavy_hitters" -> 9, "q_table_profile" -> 4,
    "q_dq_checks" -> 6,
    // one row per swept nprobe width (deployment constant), zero counts
    "q_ann_nprobe_sweep" -> graft.queries.VectorQueries.ProbeSweep.size,
    // one row per workload probe range (deployment constant), zero files/rows
    "q_zorder_pruning_gain" -> 16,
    // one row per swept bit-array size (deployment constant), fpr_ppm = -1
    "q_bloom_fpr_sweep" -> 4,
    // fully SYNTHESIZED corpus (in-row id-derived vectors; reads no input
    // table at all): (arm x cohort) grid is a fixture constant
    "q_ann_refresh_recall" -> 4,
    // fully SYNTHESIZED pairs (in-row hashP constructions, corpus-free):
    // one row per exact-Jaccard level — a fixture constant
    "q_dedup_recall_waterline" -> 6)

  test("every query on empty tables: empty result or clear config error") {
    val src = "/root/testdata/sf0.001"
    val dst = Files.createTempDirectory("graft-empty").toString
    // events goes through THE loader (Tables.events) so the empty twin gets
    // the normalized TimestampType ts regardless of the fixture's encoding
    // (r7: a duplicated legacy-flag assumption here broke with regenerated
    // testdata); the twin round-trips through the loader's TimestampType arm
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    Tables.events(spark, src)
      .limit(0).write.mode("overwrite").parquet(s"$dst/events.parquet")
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dst).collect().length
        val maxRows =
          if (globalAggOneRow(name)) 1 else constantRows.getOrElse(name, 0)
        if (n > maxRows) failures += s"$name: non-empty result ($n rows) from empty input"
        if (requiresZoneDim(name))
          failures += s"$name: expected loud empty-dimension error, got success"
      } catch {
        case e: IllegalArgumentException
          if requiresZoneDim(name) && String.valueOf(e.getMessage).contains("empty zone dimension") =>
          () // deliberate, clearly-worded config error
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}"
      }
      spark.catalog.clearCache()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
