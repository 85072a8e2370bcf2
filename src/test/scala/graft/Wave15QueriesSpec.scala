package graft

import graft.queries.{BehaviorQueries, ParityQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 15 queries — independent
  * driver-side recomputations on sf0.001.
  */
class Wave15QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_audience_overlap matches a set-algebra recompute; Jaccard is symmetric-complete") {
    val tu = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getAs[Long]("user_id")))
    val sets = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val want = (for {
      a <- types; b <- types if a < b
    } yield {
      val inter = (sets(a) & sets(b)).size.toLong
      (a, b, sets(a).size.toLong, sets(b).size.toLong, inter,
        inter * 1000000L / (sets(a).size + sets(b).size - inter))
    }).toSet
    val got = BehaviorQueries.qAudienceOverlap.run(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
        r.getAs[Long]("jaccard_e6"))).toSet
    assert(got == want)
    // all C(|types|, 2) pairs present (no pair silently dropped)
    assert(got.size == types.size * (types.size - 1) / 2)
  }

  test("q_new_vs_returning matches a first-day recompute; new users telescope to the user count") {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getAs[Long]("user_id"), r.getDate(1).toString))
    val first = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = ud.groupBy(_._2).map { case (day, rows) =>
      val nNew = rows.count(r => first(r._1) == day).toLong
      (day, nNew, rows.size.toLong - nNew, rows.size.toLong)
    }.toSet
    val got = BehaviorQueries.qNewVsReturning.run(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n_new"),
        r.getAs[Long]("n_returning"), r.getAs[Long]("dau"))).toSet
    assert(got == want)
    // Σ n_new over days = distinct users (each user is new exactly once)
    assert(got.toSeq.map(_._2).sum == first.size.toLong)
  }

  test("q_sla_by_priority matches an order-grain recompute; SLA shares are monotone") {
    val fs = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(min(to_date(col("l_shipdate"))).as("s"))
      .collect().map(r => r.getAs[Long]("l_orderkey") -> r.getDate(1).toLocalDate).toMap
    val want = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("long"), col("o_orderpriority"),
        to_date(col("o_orderdate")))
      .collect()
      .flatMap { r =>
        fs.get(r.getLong(0)).map { ship =>
          (r.getString(1),
            java.time.temporal.ChronoUnit.DAYS.between(r.getDate(2).toLocalDate, ship))
        }
      }
      .groupBy(_._1).map { case (p, rows) =>
        val n = rows.size.toLong
        def sla(d: Long) = rows.count(_._2 <= d).toLong * 10000L / n
        (p, n, sla(30), sla(60), sla(90))
      }.toSet
    val got = ParityQueries.qSlaByPriority.run(spark, dir).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("sla30_e4"), r.getAs[Long]("sla60_e4"),
        r.getAs[Long]("sla90_e4"))).toSet
    assert(got == want)
    got.foreach { case (_, _, s30, s60, s90) =>
      assert(s30 <= s60 && s60 <= s90 && s90 <= 10000L)
    }
  }

  test("q_embedding_norm_profile matches an in-row fold recompute and covers every vector") {
    val emb = Tables.embeddings(spark, dir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val norms = emb.map { v =>
      v.map(x => { val q = math.round(x * 1000000); q * q }).sum
    }
    val want = norms.groupBy(n => java.lang.Long.toBinaryString(n).length.toLong)
      .map { case (b, ns) => (b, ns.length.toLong, ns.min, ns.max) }.toSet
    val got = VectorQueries.qEmbeddingNormProfile.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("norm_bin"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("min_norm2"), r.getAs[Long]("max_norm2"))).toSet
    assert(got == want)
    assert(got.toSeq.map(_._2).sum == emb.length.toLong)
  }
}
