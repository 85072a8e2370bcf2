package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.HashOps

/** K-minimum-values (KMV) cardinality sketches — the mergeable
  * distinct-count summary (Bar-Yossef et al. 2002; the theta-sketch
  * family): keep the k smallest values of a uniform hash of the key; the
  * k-th minimum h_k estimates cardinality as (k−1)·M / h_k for hash space
  * [0, M). Unlike HyperLogLog (`approx_distinct_users`, rows-only gated),
  * KMV is DETERMINISTIC given the hash, so both engines compute the
  * identical estimate and the oracle gate checks it at full value level.
  *
  * The house md5-based [[HashOps.hashP]] is the uniform hash (M = 1e9+7,
  * so (k−1)·M stays far under int64). Scale shape: the sketch is an
  * algebraic aggregate — per-partition top-k-min partials merge
  * associatively — here expressed as distinct + per-group k-th order
  * statistic (row_number over a |distinct keys|-sized frame, NOT the fact
  * table). Sketch size k is a deployment constant.
  */
object SketchQueries {

  private val K = 64

  /** Per-group KMV distinct estimate vs the exact count (the estimator
    * quality is part of the output contract). Groups with fewer than k
    * distinct hashes short-circuit to the exact sketch content — the
    * standard KMV small-set convention. */
  val kmvDistinct: Q = new Q {
    val name = "q_kmv_distinct"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val ev = Tables.events(spark, dir)
      val hashes = ev.select(col("event_type"),
          HashOps.hashP(concat(col("user_id").cast("string"), lit(":kmv"))).as("hv"))
        .distinct().persist()
      val stats = hashes.groupBy("event_type").agg(count(lit(1)).as("n_hashes"))
      val kth = hashes
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("hv")))
        .where(col("rn") === K)
        .select(col("event_type"), col("hv").as("hk"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
      exact.join(stats, Seq("event_type"))
        .join(kth, Seq("event_type"), "left")
        .select(col("event_type"), col("n_exact"),
          when(col("n_hashes") < K, col("n_hashes"))
            .otherwise(expr(s"${(K - 1) * HashOps.P}L div hk"))
            .as("kmv_estimate"))
        .orderBy("event_type")
    }
    val oracle = Some {
      val h = HashOps.sqlHashP("concat(CAST(user_id AS VARCHAR), ':kmv')")
      s"""WITH h AS (SELECT DISTINCT event_type, $h AS hv FROM events),
         |st AS (SELECT event_type, count(*) AS n_hashes FROM h GROUP BY 1),
         |r AS (SELECT event_type, hv,
         |        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
         |      FROM h),
         |kth AS (SELECT event_type, hv AS hk FROM r WHERE rn = $K),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
         |       FROM events GROUP BY 1)
         |SELECT ex.event_type, CAST(ex.n_exact AS BIGINT) AS n_exact,
         |  CAST(CASE WHEN st.n_hashes < $K THEN st.n_hashes
         |       ELSE ${(K - 1) * HashOps.P} // kth.hk END AS BIGINT)
         |    AS kmv_estimate
         |FROM ex JOIN st USING (event_type)
         |LEFT JOIN kth USING (event_type)
         |ORDER BY event_type""".stripMargin
    }
  }

  /** Sketch MERGE — the property that makes KMV a distributed aggregate:
    * union the per-group k-min sets, re-take the k smallest, estimate the
    * union cardinality. Compared against the exact global distinct so the
    * mergeability claim is value-checked, not asserted. */
  val kmvUnion: Q = new Q {
    val name = "q_kmv_union"
    def run(spark: SparkSession, dir: String): DataFrame = {
      val ev = Tables.events(spark, dir)
      val hashes = ev.select(col("event_type"),
          HashOps.hashP(concat(col("user_id").cast("string"), lit(":kmv"))).as("hv"))
        .distinct()
      // per-group sketches: the ≤k smallest hashes of each group
      val sketches = hashes
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("hv")))
        .where(col("rn") <= K)
      val merged = sketches.select("hv").distinct().persist()
      val stats = merged.agg(count(lit(1)).as("n_hashes"))
      val kth = merged
        .withColumn("rn", row_number().over(Window.orderBy("hv")))
        .where(col("rn") === K).select(col("hv").as("hk"))
      val exact = ev.agg(countDistinct("user_id").as("n_exact"),
        countDistinct("event_type").as("n_groups"))
      exact.crossJoin(broadcast(stats)).join(kth, lit(true), "left")
        .select(col("n_groups"), col("n_exact"),
          when(col("n_hashes") < K, col("n_hashes"))
            .otherwise(expr(s"${(K - 1) * HashOps.P}L div hk"))
            .as("kmv_union_estimate"))
    }
    val oracle = Some {
      val h = HashOps.sqlHashP("concat(CAST(user_id AS VARCHAR), ':kmv')")
      s"""WITH h AS (SELECT DISTINCT event_type, $h AS hv FROM events),
         |sk AS (SELECT event_type, hv,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
         |       FROM h),
         |merged AS (SELECT DISTINCT hv FROM sk WHERE rn <= $K),
         |st AS (SELECT count(*) AS n_hashes FROM merged),
         |r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM merged),
         |kth AS (SELECT hv AS hk FROM r WHERE rn = $K),
         |ex AS (SELECT count(DISTINCT user_id) AS n_exact,
         |         count(DISTINCT event_type) AS n_groups FROM events)
         |SELECT CAST(ex.n_groups AS BIGINT) AS n_groups,
         |  CAST(ex.n_exact AS BIGINT) AS n_exact,
         |  CAST(CASE WHEN st.n_hashes < $K THEN st.n_hashes
         |       ELSE ${(K - 1) * HashOps.P} // kth.hk END AS BIGINT)
         |    AS kmv_union_estimate
         |FROM ex CROSS JOIN st LEFT JOIN kth ON true""".stripMargin
    }
  }

  def all: Seq[Q] = Seq(kmvDistinct, kmvUnion)
}
