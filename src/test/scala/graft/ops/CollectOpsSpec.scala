package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CollectOpsSpec extends SparkSpec {
  import spark.implicits._

  test("orderedCollect is deterministic regardless of partitioning") {
    val data = (1 to 200).map(i => (i % 5L, 1000 - i, s"v$i"))
    val a = data.toDF("k", "ord", "v").repartition(1)
      .groupBy("k").agg(CollectOps.orderedCollect($"ord", $"v").as("xs"))
      .as[(Long, Seq[String])].collect().toMap
    val b = scala.util.Random.shuffle(data).toDF("k", "ord", "v").repartition(7)
      .groupBy("k").agg(CollectOps.orderedCollect($"ord", $"v").as("xs"))
      .as[(Long, Seq[String])].collect().toMap
    assert(a === b)
    // ascending by sort key
    val expected0 = data.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    assert(a(0L) === expected0)
  }

  test("pivotCounts equals the equivalent groupBy counts, zero-filled") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "b")).toDF("k", "t")
    val piv = CollectOps.pivotCounts(df.groupBy("k"), "t", Seq("a", "b", "c"), "n_")
      .orderBy("k").collect()
    assert(piv.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((1, 2L, 1L, 0L), (2, 0L, 1L, 0L)))
  }

  test("ShingleHashSet handles multibyte UTF-8 tokens (byte-level join path)") {
    val df = Seq((1L, "héllo wörld ünïcødé done"), (2L, "héllo wörld ünïcødé done"))
      .toDF("doc_id", "text")
    val kernel = df.select($"doc_id", TextOps.shingleHashes($"text", 3).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val compositional = df.select($"doc_id",
      array_distinct(transform(TextOps.shingles(TextOps.tokens($"text"), 3),
        s => HashOps.hashP(s))).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap.view.mapValues(_.toSet).toMap
    assert(kernel(1L).toSet === compositional(1L))
    assert(kernel(1L) === kernel(2L)) // identical docs → identical sets
    assert(kernel(1L).nonEmpty)
  }
}
