package graft

import graft.queries.{BehaviorQueries, EvalQueries}
import org.apache.spark.sql.functions._

/** Invariant specs for the round-9 wave 17 queries — independent
  * driver-side recomputations on sf0.001.
  */
class Wave17QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_ab_test matches an exact-rational recompute; verdict agrees with double z²") {
    val users = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("c")))
    val (aArm, bArm) = users.partition(_._1 % 2 == 0)
    val (na, xa) = (aArm.size.toLong, aArm.map(_._2).sum)
    val (nb, xb) = (bArm.size.toLong, bArm.map(_._2).sum)
    val lhs = BigInt(xa) * nb - BigInt(xb) * na
    val z2lhs = lhs * lhs * (na + nb) * 10000
    val z2rhs = BigInt(38415) * na * nb * (xa + xb) * (na + nb - xa - xb)
    val r = EvalQueries.qAbTest.run(spark, dir).collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("x_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("x_b")) == ((na, xa, nb, xb)))
    assert(BigInt(r.getAs[String]("z2_lhs")) == z2lhs)
    assert(BigInt(r.getAs[String]("z2_rhs")) == z2rhs)
    assert(r.getAs[Long]("significant") == (if (z2lhs > z2rhs) 1L else 0L))
    // the integer inequality must agree with the textbook double computation
    val (p1, p2) = (xa.toDouble / na, xb.toDouble / nb)
    val p = (xa + xb).toDouble / (na + nb)
    val z2 = (p1 - p2) * (p1 - p2) / (p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert((z2 > 3.8415) == (z2lhs > z2rhs))
  }

  test("q_seq_pattern_pairs matches a first-occurrence recompute; supersets markov adjacency") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val sessions = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ListBuffer.empty[Seq[(Long, Long, String)]]
      var cur = List.empty[(Long, Long, String)]
      sorted.foreach { case (_, us, id, et) =>
        if (cur.nonEmpty && us - cur.last._1 > 1800000000L) { out += cur; cur = Nil }
        cur = cur :+ ((us, id, et))
      }
      if (cur.nonEmpty) out += cur
      out.toSeq
    }
    val pairCounts = sessions.flatMap { s =>
      val firsts = s.groupBy(_._3).view
        .mapValues(rs => rs.map(r => (r._1, r._2)).min).toSeq
      for {
        (ta, fa) <- firsts; (tb, fb) <- firsts
        if ta != tb && (fa._1 < fb._1 || (fa._1 == fb._1 && fa._2 < fb._2))
      } yield (ta, tb)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nSess = sessions.size.toLong
    val want = pairCounts.map { case ((a, b), n) =>
      (a, b, n, n * 10000L / nSess)
    }.toSet
    val got = BehaviorQueries.qSeqPatternPairs.run(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[Long]("n_sess"), r.getAs[Long]("support_e4"))).toSet
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._4 <= 10000L))
  }
}
