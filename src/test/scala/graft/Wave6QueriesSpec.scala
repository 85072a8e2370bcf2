package graft

import graft.queries.{DedupQueries, EvalQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave-6 queries (containment dedup,
  * l-diversity, TWAP) — independent driver-side recomputations on
  * sf0.001. */
class Wave6QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_containment matches a driver-side candidate+verify recomputation") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"),
        graft.ops.TextOps.shingleHashes(col("text"), DedupQueries.ShingleK).as("hs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet))
    val byId = docs.toMap
    val df = docs.flatMap(_._2.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val rare = df.collect { case (h, d) if d >= 2 && d <= DedupQueries.MaxDf => h }.toSet
    val cands = (for {
      (l, hl) <- docs; (r, hr) <- docs
      if l < r && (hl & hr & rare).size >= 3
    } yield (l, r)).toSet
    val want = cands.flatMap { case (l, r) =>
      val inter = (byId(l) & byId(r)).size.toLong
      def dir0(sub: Long, sup: Long): Option[(Long, Long, Long, Long, Long)] = {
        val sz = byId(sub).size.toLong
        if (sz > 0 && inter * 10000 >= sz * 9000)
          Some((sub, sup, inter, sz, inter * 10000L / sz))
        else None
      }
      dir0(l, r) ++ dir0(r, l)
    }
    val got = DedupQueries.dedupContainment.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("inter"),
        r.getAs[Long]("sz_sub"), r.getAs[Long]("cont_e4"))).toSet
    assert(got == want)
    assert(want.nonEmpty, "no containment pairs — threshold dead at this SF")
  }

  test("q_l_diversity matches a driver-side recomputation and flags correctly") {
    val natRegion = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = cust.groupBy { case (n, s) => (natRegion(n), s) }
      .map { case ((reg, seg), rows) =>
        val nd = rows.map(_._1).distinct.length.toLong
        (reg, seg, rows.length.toLong, nd, if (nd >= 3) 1L else 0L)
      }.toSet
    val got = EvalQueries.qLDiversity.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Long]("n_sensitive"), r.getAs[Long]("satisfies_l"))).toSet
    assert(got == want)
  }

  test("q_twap matches a driver-side hold-duration recomputation") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = ev.groupBy(_._1).collect {
      case (u, rows) if rows.length >= 2 =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        val holds = sorted.zip(sorted.tail).map { case (a, b) =>
          (cents(a._4), b._2 - a._2) // micros
        }
        val tot = holds.map(_._2).sum
        val wsum = holds.map(h => h._1 * h._2).sum
        (u, holds.length.toLong, tot, wsum / tot)
    }.toSet
    val got = TimeSeriesQueries.qTwap.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_holds"),
        r.getAs[Long]("total_dur_us"), r.getAs[Long]("twap_cents"))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
