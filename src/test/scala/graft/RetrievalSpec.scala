package graft

import graft.queries.{MixQueries, TextQueries}

/** Specs for the round-5 retrieval/assembly operators: BM25's ranking
  * invariants and plan shape, and the stratified split's partition
  * properties (value parity is the DuckDB gate's job). */
class RetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bm25_topk: top-50 is TakeOrdered, scores positive and non-increasing") {
    val df = TextQueries.bm25Topk.run(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getAs[Long]("score_e4"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not ordered descending")
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_terms_hit")
      assert(hits >= 1 && hits <= 4)
    }
  }

  test("corpus_split partitions every source 3-ways with a dominant train share") {
    val rows = MixQueries.corpusSplit.run(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nCorpus = Tables.documents(spark, dir).count()
    assert(total === nCorpus, "splits do not partition the corpus")
    val byCat = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(byCat.keySet.subsetOf(Set("train", "val", "test")))
    // 80/10/10 by hash bucket: train strictly dominates at any corpus size
    assert(byCat("train") > byCat.getOrElse("val", 0L) &&
      byCat("train") > byCat.getOrElse("test", 0L))
  }

  test("corpus_split assignment is a pure function of doc_id (stable under re-run)") {
    val a = MixQueries.corpusSplit.run(spark, dir).collect().map(_.toString).sorted
    val b = MixQueries.corpusSplit.run(spark, dir).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
