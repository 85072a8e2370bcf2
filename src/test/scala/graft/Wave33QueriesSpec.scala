package graft

import graft.queries.TextQueries

/** Round-10 wave 33: vocabulary construction — driver recompute of the
  * frequency-ordered dictionary plus the property the distributed id
  * assignment must uphold: ids are a contiguous 0..V−1 permutation in
  * exact (n_occ DESC, token ASC) order even when the dictionary spans
  * many range partitions, and the coverage curve is monotone to 1e6 ppm.
  */
class Wave33QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_vocab_index matches a driver recompute of ids, mass, and coverage") {
    val toks = Tables.documents(spark, dir).select("text").collect()
      .flatMap(r => "\\S+".r.findAllIn(r.getString(0).toLowerCase)).toSeq
    val counts = toks.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val ordered = counts.toSeq.sortBy { case (t, n) => (-n, t) }
    val total = counts.values.sum
    var cum = 0L
    val want = ordered.zipWithIndex.map { case ((t, n), i) =>
      val row = (i.toLong, t, n, cum, (cum + n) * 1000000L / total)
      cum += n
      row
    }
    val got = TextQueries.qVocabIndex.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && want.nonEmpty)
    // contiguity + the curve's endpoints
    assert(got.map(_._1) == (0L until got.size).toSeq)
    assert(got.last._5 == 1000000L, "coverage must close at exactly 1e6 ppm")
    assert(got.map(_._5) == got.map(_._5).sorted, "coverage curve must be monotone")
  }

  test("id assignment is exact when the dictionary spans many partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10k distinct synthetic tokens over 16 slices — far more partitions
    // than a tiny natural vocab would fill
    val df = (0 until 10000).map(i => (s"tok_${"%05d".format(i)}", (i % 97 + 1).toLong))
      .toDF("token", "n_occ")
    val ranked = df.repartitionByRange(16, col("n_occ").desc, col("token"))
      .sortWithinPartitions(col("n_occ").desc, col("token"))
    val got = ranked.rdd.zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i) }.collect().toSeq
      .sortBy(_._3)
    val want = (0 until 10000).map(i => (s"tok_${"%05d".format(i)}", (i % 97 + 1).toLong))
      .sortBy { case (t, n) => (-n, t) }
    assert(got.map(t => (t._1, t._2)) == want)
  }
}
