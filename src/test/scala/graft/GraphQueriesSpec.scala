package graft

import graft.queries.GraphQueries

/** Math-level checks for the graph operators (the oracle gate checks
  * engine parity; this spec checks the invariants the algorithms claim). */
class GraphQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_pagerank: rank mass is conserved up to integer-division leakage") {
    val rows = GraphQueries.pagerank.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getAs[Long]("pr_e9")).sum
    // every node keeps at least the teleport floor 0.15e9/N
    val floor = (15L * 1000000000L) / (100L * n)
    rows.foreach(r => assert(r.getAs[Long]("pr_e9") >= floor, s"below teleport floor: $r"))
    // total mass ≤ 1e9 (dangling + integer-div mass only ever leaks out),
    // and ≥ the teleport mass alone
    assert(total <= 1000000000L, s"mass grew: $total")
    assert(total >= floor * n, s"lost even the teleport mass: $total")
    // output ordering contract: desc by rank, ties by key
    val pairs = rows.map(r => (r.getAs[Long]("pr_e9"), r.getAs[Int]("nation_key").toLong))
    assert(pairs.sameElements(pairs.sortBy { case (r, k) => (-r, k) }))
  }

  test("q_bfs_hops: source at 0, every edge spans at most one level") {
    val dists = GraphQueries.bfsHops.run(spark, dir).collect()
      .map(r => r.getAs[Int]("nation_key").toLong -> r.getAs[Long]("hop_dist")).toMap
    assert(dists(0L) === 0L)
    // reached nodes form contiguous levels from the source
    val reached = dists.values.filter(_ < 999L)
    assert(reached.nonEmpty)
    (0L to reached.max).foreach(d => assert(reached.exists(_ == d), s"level $d empty"))
  }

  test("q_copurchase_edges: canonical pair order and support threshold hold") {
    val rows = GraphQueries.copurchaseEdges.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(r.getAs[Long]("n_orders") >= 2L)
    }
  }

  test("q_graph_cc: labels are component minima and sizes are consistent") {
    val rows = GraphQueries.graphCc.run(spark, dir).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (label, members) =>
      val ids = members.map(_.getAs[Long]("part_key"))
      assert(ids.min === label, s"label $label is not the min member id")
      members.foreach(m =>
        assert(m.getAs[Long]("cluster_size") === members.length.toLong))
    }
    // every part appears exactly once
    assert(rows.map(_.getAs[Long]("part_key")).distinct.length === rows.length)
  }

  test("q_link_prediction: common-neighbor count bounded by the smaller degree") {
    val rows = GraphQueries.linkPrediction.run(spark, dir).collect()
    assert(rows.nonEmpty)
    // rebuild the CAPPED reverse-membership degrees (same top-32 window as
    // the query) so cn ≤ min(deg) and the Jaccard decomposition are
    // checked against independent numbers, not the query's own outputs
    val deg = {
      import org.apache.spark.sql.functions._
      val cop = graft.queries.GraphQueries.copurchaseEdges.run(spark, dir)
        .select(col("part_a").as("pa"), col("part_b").as("pb"), col("n_orders"))
      val adj0 = cop.select(col("pa").as("w"), col("pb").as("n"), col("n_orders"))
        .union(cop.select(col("pb"), col("pa"), col("n_orders")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("w")
        .orderBy(col("n_orders").desc, col("n"))
      adj0.withColumn("rn", row_number().over(w)).where(col("rn") <= 32)
        .groupBy(col("n")).count().collect()
        .map(r => r.getAs[Long]("n") -> r.getAs[Long]("count")).toMap
    }
    rows.foreach { r =>
      val cn = r.getAs[Long]("common_neighbors")
      val jac = r.getAs[Long]("jaccard_e4")
      val a = r.getAs[Long]("part_a"); val b = r.getAs[Long]("part_b")
      assert(cn >= 2L)
      assert(a < b)
      assert(cn <= math.min(deg(a), deg(b)),
        s"common neighbors exceed the smaller capped degree: $r")
      assert(jac === cn * 10000L / (deg(a) + deg(b) - cn),
        s"jaccard does not decompose into cn and degrees: $r")
      assert(jac > 0L && jac <= 10000L, s"jaccard out of range: $r")
    }
    val jacs = rows.map(_.getAs[Long]("jaccard_e4"))
    assert(jacs.sameElements(jacs.sorted.reverse), "not ranked by similarity")
  }

  test("q_weighted_sssp: distances satisfy the relaxation inequality at fixpoint") {
    import org.apache.spark.sql.functions._
    val dists = GraphQueries.weightedSssp.run(spark, dir).collect()
      .map(r => r.getAs[Int]("nation_key").toLong -> r.getAs[Long]("dist_w")).toMap
    assert(dists(0L) === 0L)
    // rebuild the weighted edges driver-side and check d(v) <= d(u) + w(u,v)
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val edges = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .count().where(col("src") =!= col("dst"))
      .collect()
      .map(r => (r.getAs[Int]("src").toLong, r.getAs[Int]("dst").toLong,
        1000L - math.min(r.getAs[Long]("count"), 999L)))
    edges.foreach { case (u, v, w) =>
      if (dists(u) < 999999L)
        assert(dists(v) <= dists(u) + w, s"relaxation violated on edge ($u,$v,$w)")
    }
  }

  test("q_graph_triangles: counts are positive and sum to a multiple of 3") {
    val rows = GraphQueries.triangles.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getAs[Long]("n_triangles"))
    counts.foreach(c => assert(c > 0))
    // each triangle contributes exactly one count to each of its 3 corners
    assert(counts.sum % 3 === 0, s"corner-role sum not divisible by 3: ${counts.sum}")
  }
}
