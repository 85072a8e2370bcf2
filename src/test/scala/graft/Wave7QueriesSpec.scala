package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** Invariant spec for q_graph_walks — independent driver-side walk
  * recomputation on sf0.001. */
class Wave7QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val P = 1000000007L

  private def hashP(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % P
  }

  test("q_graph_walks matches a driver-side seeded-walk recomputation") {
    val edges = GraphQueries.copurchaseEdges.run(spark, dir)
      .select(col("part_a").cast("long"), col("part_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, IndexedSeq[Long]] =
      (edges ++ edges.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).sorted.toIndexedSeq }
    val starts = Tables.part(spark, dir)
      .where(col("p_partkey") % 50 === 0)
      .select(col("p_partkey").cast("long")).collect().map(_.getLong(0))
    val want = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    starts.foreach { a =>
      var cur = a
      want += ((a, a, 0))
      var alive = true
      for (s <- 1 to 3 if alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            cur = nbrs((hashP(s"$a:$s") % nbrs.length).toInt)
            want += ((a, cur, s))
          case None => alive = false
        }
      }
    }
    val got = GraphQueries.graphWalks.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("start_key"), r.getAs[Long]("node_key"),
        r.getAs[Int]("step"))).toSet
    assert(got == want.toSet)
    assert(want.exists(_._3 == 3), "no walk reached 3 steps — graph degenerate")
  }

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q_shard_manifest matches a driver-side budgeted sharding recompute") {
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        bpe.findAllIn(r.getString(2)).length.toLong))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ordered = ds.map(d => (d._1, d._3, h60(s"${d._1}:shard")))
        .sortBy { case (id, _, h) => (h, id) }
      var off = 0L
      ordered.map { case (id, toks, _) =>
        val shard = off / 64L
        off += toks
        (src, shard, id, toks)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((src, shard), rows) =>
      (src, shard, rows.size.toLong, rows.map(_._4).sum,
        rows.map(r => h60(r._3.toString) % 1000000000L).sum)
    }.toSet
    val got = graft.queries.MixQueries.shardManifest.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("tokens"), r.getAs[Long]("member_checksum"))).toSet
    assert(got == want)
    assert(want.exists(_._2 > 0), "every source fits one shard — budget degenerate")
  }
}
