package graft

import graft.queries.{BehaviorQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 18 queries — independent
  * driver-side recomputations on sf0.001.
  */
class Wave18QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_chi2_terms matches a 2x2 recompute; verdict agrees with double chi²") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getString(1) == "en",
        r.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSet))
    val nDocs = docs.length.toLong
    val nEn = docs.count(_._1).toLong
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val top = df.toSeq.sortBy(t => (-t._2, t._1)).take(20).zipWithIndex
    val want = top.map { case ((term, dfN), i) =>
      val a = docs.count(d => d._1 && d._2(term)).toLong
      val b = dfN - a
      val c = nEn - a
      val d = nDocs - nEn - b
      val det = BigInt(a) * d - BigInt(b) * c
      val lhs = BigInt(nDocs) * det * det * 10000
      val rhs = BigInt(38415) * (a + b) * (c + d) * (a + c) * (b + d)
      (term, i + 1L, a, b, c, d, lhs.toString, rhs.toString,
        if (lhs > rhs) 1L else 0L)
    }.toSet
    val got = TextQueries.qChi2Terms.run(spark, dir).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("rank"), r.getAs[Long]("a"),
        r.getAs[Long]("b"), r.getAs[Long]("c"), r.getAs[Long]("d"),
        r.getAs[String]("chi2_lhs"), r.getAs[String]("chi2_rhs"),
        r.getAs[Long]("significant"))).toSet
    assert(got == want)
    // integer verdict agrees with the textbook double chi² on every row
    got.foreach { case (_, _, a, b, c, d, lhsS, rhsS, sig) =>
      val n = (a + b + c + d).toDouble
      val det = a.toDouble * d - b.toDouble * c
      val chi2 = n * det * det /
        ((a + b).toDouble * (c + d) * (a + c) * (b + d))
      assert((chi2 > 3.8415) == (sig == 1L),
        s"verdict mismatch at chi2=$chi2")
      assert((BigInt(lhsS) > BigInt(rhsS)) == (sig == 1L))
    }
  }

  test("q_attribution_linear matches a per-session credit recompute; credit conserves") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val sessions = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ListBuffer.empty[Seq[String]]
      var cur = List.empty[(Long, String)]
      sorted.foreach { case (_, us, _, et) =>
        if (cur.nonEmpty && us - cur.last._1 > 1800000000L) {
          out += cur.map(_._2); cur = Nil
        }
        cur = cur :+ ((us, et))
      }
      if (cur.nonEmpty) out += cur.map(_._2)
      out.toSeq
    }
    val converting = sessions.filter(s => s.contains("purchase"))
      .map(s => s.filterNot(_ == "purchase")).filter(_.nonEmpty)
    val credits = converting.flatMap { touches =>
      val per = 1000000L / touches.size
      touches.map(_ -> per)
    }
    val want = credits.groupBy(_._1).map { case (ch, cs) =>
      (ch, cs.size.toLong, cs.map(_._2).sum)
    }.toSet
    val got = BehaviorQueries.qAttributionLinear.run(spark, dir).collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("n_touches_total"),
        r.getAs[Long]("credit_e6"))).toSet
    assert(got == want)
    // conservation: total credit = converting sessions × 1e6, minus the
    // documented truncation remainder (< n_touches per session)
    val total = got.toSeq.map(_._3).sum
    val ideal = converting.size.toLong * 1000000L
    assert(total <= ideal && ideal - total < converting.map(_.size.toLong).sum)
  }
}
