package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal distributed k-means (Lloyd's) over an `array<float>` embedding
  * column — the clustering complement to the ANN/dedup vector operators.
  *
  * Scale shape per iteration: one broadcast of k·dim centroid floats into
  * an in-row argmin (no join, no shuffle for assignment — distances via
  * the codegen DotProduct kernel and the identity ‖x−c‖² = ‖x‖² − 2x·c +
  * ‖c‖², where ‖x‖² is assignment-invariant), then ONE groupBy computing
  * per-dimension means (partial aggregation map-side). Centroids live on
  * the driver between iterations (k·dim doubles — trivially small).
  *
  * Initialization is deterministic (k lowest ids); note float-mean
  * accumulation order makes centroid low bits run-dependent, so exact
  * centroid values are not oracle-comparable — consumers should treat
  * assignments/inertia as approximate (rows-only checks + property tests).
  */
object KMeansOps {

  case class Model(centroids: Array[Array[Double]], inertia: Double)

  /** Squared distance to centroid j minus the row-constant ‖x‖² term.
    * Both the cross term and ‖c‖² use the SAME float-cast centroid values
    * (the dot kernel operates on floats), so the score is exactly
    * ‖x−c_f‖² − ‖x‖² for the float representation — mixing precisions
    * would flip borderline assignments relative to either formulation. */
  private def scoreTo(vec: Column, c: Array[Double]): Column = {
    val cf = c.map(x => x.toFloat.toDouble)
    val cFloat = typedLit(cf.map(_.toFloat).toSeq)
    lit(-2.0) * graft.expressions.F.dot(vec, cFloat) + lit(cf.map(x => x * x).sum)
  }

  /** Index of the nearest centroid (ties → lowest index). */
  def assignment(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scores = centroids.map(c => scoreTo(vec, c))
    val best = scores.reduce((a, b) => least(a, b))
    scores.zipWithIndex.foldRight(lit(centroids.length - 1)) {
      case ((s, idx), rest) => when(s === best, lit(idx)).otherwise(rest)
    }
  }

  /** Run `iters` Lloyd iterations from the k lowest-id vectors. */
  def fit(emb: DataFrame, k: Int, iters: Int, dim: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    require(k >= 1 && iters >= 0, s"k-means: need k >= 1 and iters >= 0, got k=$k iters=$iters")
    var centroids: Array[Array[Double]] = emb
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (centroids.isEmpty) return Model(Array.empty, 0.0)
    var it = 0
    while (it < iters) {
      val assigned = emb.withColumn("__c", assignment(col(vecCol), centroids))
      // one VectorSum aggregate + count instead of `dim` avg() columns
      val means = assigned.groupBy("__c")
        .agg(count(lit(1)).as("n"),
          graft.expressions.F.vectorSum(col(vecCol), dim).as("s"))
        .collect()
      means.foreach { r =>
        val c = r.getAs[Int]("__c")
        val n = r.getAs[Long]("n").toDouble
        centroids(c) = r.getSeq[Double](r.fieldIndex("s")).map(_ / n).toArray
      }
      it += 1
    }
    val inertia = emb.select(
      centroids.map(c => scoreTo(col(vecCol), c)).reduce((a, b) => least(a, b)).as("s"),
      graft.expressions.F.dot(col(vecCol), col(vecCol)).as("xx"))
      .agg(sum(col("s") + col("xx"))).head().getDouble(0)
    Model(centroids, inertia)
  }

  /** Assignment DataFrame for a fitted model. */
  def transform(emb: DataFrame, model: Model,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), assignment(col(vecCol), model.centroids).as("cluster"))

  // ----- exact integer path ------------------------------------------------
  //
  // The float path above is run-dependent in its centroid low bits (parallel
  // mean accumulation order), so its assignments can't be cross-checked
  // against an external oracle. The exact path quantizes the embedding to
  // BIGINT (round(x·scale)) and runs Lloyd's entirely in integer arithmetic:
  // integer squared distances (ties → lowest centroid index) and centroids as
  // round-half-up integer means, floor((2s+n)/(2n)). Every step is
  // order-independent, so results are bit-identical run-to-run AND engine-to-
  // engine — a DuckDB SQL unrolling of the same iterations reproduces the
  // assignments exactly. Bounds (|x| < 1, scale=1e6, dim=64, n ≤ 1e6 rows):
  // per-row distance ≤ 64·(2e6)² ≈ 2.6e14, dimension sums ≤ 1e12 — far
  // inside BIGINT.

  /** round(x·scale) per element, as `array<long>`. */
  def quantize(vec: Column, scale: Long): Column =
    // functions.transform — the object's own `transform` shadows the import
    org.apache.spark.sql.functions.transform(
      vec, x => round(x.cast("double") * scale).cast("long"))

  /** Index of the nearest integer centroid (ties → lowest index) — one
    * codegen kernel node (NearestCentroidLong); an unrolled `when`-fold of
    * k interpreted HOF scores costs seconds of analysis per iteration. */
  def assignmentExact(v: Column, centroids: Array[Array[Long]]): Column =
    graft.expressions.F.nearestCentroid(v, centroids)

  /** `iters` integer Lloyd iterations from the k lowest-id vectors; empty
    * clusters keep their previous centroid. */
  def fitExact(emb: DataFrame, k: Int, iters: Int, scale: Long = 1000000L,
               idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Long]] = {
    require(k >= 1 && iters >= 0, s"k-means: need k >= 1 and iters >= 0, got k=$k iters=$iters")
    val q = emb.select(col(idCol).as("__id"), quantize(col(vecCol), scale).as("__v"))
    var centroids: Array[Array[Long]] = q
      .orderBy(col("__id")).limit(k)
      .select(col("__v")).collect()
      .map(_.getSeq[Long](0).toArray)
    // empty input → no centroids; transformExact mirrors with empty output
    if (centroids.isEmpty) return Array.empty
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    var it = 0
    while (it < iters) {
      val assigned = q.withColumn("__c", assignmentExact(col("__v"), centroids))
      // one VectorSumLong aggregate: shuffle carries partitions·k dim-long
      // buffers (map-side combined), not the n·dim exploded rows a
      // posexplode→groupBy moves — the difference between a constant-size
      // and a data-size shuffle per Lloyd round at corpus scale.
      val stats = assigned.groupBy("__c")
        .agg(count(lit(1)).as("n"),
          graft.expressions.F.vectorSumLong(col("__v"), dim).as("s"))
        .collect()
      val next = centroids.map(_.clone) // empty clusters keep previous
      stats.foreach { r =>
        val n = r.getAs[Long]("n")
        val s = r.getSeq[Long](r.fieldIndex("s"))
        val c = next(r.getAs[Int]("__c"))
        var j = 0
        while (j < dim) { c(j) = Math.floorDiv(2 * s(j) + n, 2 * n); j += 1 }
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Assignment DataFrame for exact integer centroids. */
  def transformExact(emb: DataFrame, centroids: Array[Array[Long]],
                     scale: Long = 1000000L, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    if (centroids.isEmpty) // empty-corpus fit: empty, correctly-typed result
      emb.where(lit(false)).select(col(idCol), lit(0L).as("cluster"))
    else
      emb.select(col(idCol),
        assignmentExact(quantize(col(vecCol), scale), centroids)
          .cast("long").as("cluster"))
}
