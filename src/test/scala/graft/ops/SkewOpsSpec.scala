package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of left rows share key 1
  private val left = (1 to 200).map(i => (i.toLong, if (i <= 180) 1 else i % 10))
    .toDF("row_id", "k")
  private val right = (0 to 9).map(i => (i, s"v$i")).toDF("k", "v")

  test("saltedJoin equals the plain inner join") {
    val plain = left.join(right, Seq("k"))
      .select("row_id", "k", "v").collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(left, right, Seq("k"), col("row_id"), 8)
      .select("row_id", "k", "v").collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("saltedJoin keeps rows whose saltSource is NULL") {
    val l = Seq((Some(1L), 1), (None, 1), (None, 3)).toDF("row_id", "k")
    val plain = l.join(right, Seq("k")).select("k", "v").collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(l, right, Seq("k"), col("row_id"), 8)
      .select("k", "v").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 2) // both null-salt rows survived
  }

  test("saltedCount equals plain groupBy count") {
    val plain = left.groupBy("k").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedCount(left, Seq("k"), col("row_id"), 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
