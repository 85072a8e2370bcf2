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

  test("q_zorder_layout: z-code ordering clusters each quadrant into a 1/4-axis bounding box") {
    val rows = graft.queries.SourceQueries.zorderLayout.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("quadrant")).foreach { case (q, rs) =>
      val zxs = rs.map(_.getAs[Long]("zx")); val zys = rs.map(_.getAs[Long]("zy"))
      // top 4 code bits = top 2 bits of each 12-bit axis → each quadrant
      // spans at most 1024 of 4096 x-units and 1024 of 4096 y-units
      assert(zxs.max - zxs.min < 1024, s"quadrant $q x-span too wide")
      assert(zys.max - zys.min < 1024, s"quadrant $q y-span too wide")
    }
    // the code is a bijection of (zx, zy): re-extract and compare
    rows.foreach { r =>
      val (zx, zy, z) = (r.getAs[Long]("zx"), r.getAs[Long]("zy"), r.getAs[Long]("zcode"))
      var (ex, ey) = (0L, 0L)
      (0 until 12).foreach { i =>
        ex |= ((z >> (2 * i)) & 1) << i
        ey |= ((z >> (2 * i + 1)) & 1) << i
      }
      assert(ex == zx && ey == zy, s"interleave not invertible at $r")
    }
  }

  test("pq_codes: every code is a codebook id and reconstruction error is non-negative") {
    val rows = graft.queries.VectorQueries.pqCodes.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val codebook = (0L until 488L by 61L).toSet
    rows.foreach { r =>
      (0 to 3).foreach { s =>
        assert(codebook.contains(r.getAs[Long](s"code_$s")),
          s"code outside codebook: $r")
      }
      assert(r.getAs[Long]("err_e6") >= 0L)
      // a codeword encodes itself in every subspace with zero error
      if (codebook.contains(r.getAs[Long]("vec_id"))) {
        assert((0 to 3).forall(s => r.getAs[Long](s"code_$s") == r.getAs[Long]("vec_id")),
          s"codeword not self-coded: $r")
        assert(r.getAs[Long]("err_e6") === 0L, s"codeword has nonzero error: $r")
      }
    }
  }

  test("ann_pq_adc_topk: per-query ranks dense, ADC distances sorted non-negative") {
    val rows = graft.queries.VectorQueries.annPqAdcTopk.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to sorted.length),
        s"ranks not dense for query $q")
      val ds = sorted.map(_.getAs[Long]("adc_e6"))
      assert(ds.forall(_ >= 0L), s"negative ADC distance for query $q")
      assert(ds.toSeq === ds.sorted.toSeq, s"ADC ordering broken for query $q")
      assert(!sorted.exists(_.getAs[Long]("c_id") == q), "query returned itself")
    }
  }

  test("q_table_diff: classes partition the key universe of both versions") {
    val rows = graft.queries.SourceQueries.tableDiff.run(spark, dir).collect()
    val byClass = rows.map(r => r.getAs[String]("class") -> r.getAs[Long]("n")).toMap
    assert(byClass.keySet === Set("added", "deleted", "changed", "same"))
    val nOrders = Tables.orders(spark, dir).count()
    // |v1 ∪ v2| = all keys minus those missing from BOTH versions (%11 and %13)
    val expectedUniverse = nOrders -
      Tables.orders(spark, dir)
        .where("o_orderkey % 11 = 0 AND o_orderkey % 13 = 0").count()
    assert(byClass.values.sum === expectedUniverse)
  }

  test("q_rrf_fusion: fused scores decompose into the two rank contributions") {
    val rows = graft.queries.TextQueries.rrfFusion.run(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val ra = r.getAs[Long]("rank_rel"); val rb = r.getAs[Long]("rank_flu")
      val expected = (if (ra > 0) 1000000L / (60 + ra) else 0L) +
        (if (rb > 0) 1000000L / (60 + rb) else 0L)
      assert(r.getAs[Long]("rrf_e6") === expected, s"rrf decomposition broke: $r")
      assert(ra > 0 || rb > 0, s"doc in neither ranking: $r")
    }
    val scores = rows.map(_.getAs[Long]("rrf_e6"))
    assert(scores.sameElements(scores.sorted.reverse), "not ordered by fused score")
  }

  test("q_bpe_merges: step-1 rule matches a driver-side pair count") {
    val rows = graft.queries.TextQueries.bpeMerges.run(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("step")).toSeq === Seq(1L, 2L, 3L))
    rows.foreach { r =>
      assert(r.getAs[String]("merged").length >= 2)
      assert(r.getAs[Long]("cnt") > 0)
    }
    // recompute round 1 from raw words on the driver
    val words = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        graft.ops.TextOps.tokens(org.apache.spark.sql.functions.col("text")))
        .as("w"))
      .collect().map(_.getString(0)).filter(_.matches("^[a-z]+$"))
      .filterNot(w => w.sliding(3).exists(t => t.length == 3 && t.distinct.length == 1))
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { w =>
      w.toSeq.sliding(2).filter(_.length == 2).foreach { p =>
        val k = s"${p(0)}${p(1)}"
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1L
      }
    }
    val (bestPair, bestCnt) = pairCounts.toSeq.map { case (p, c) => (p, c) }
      .sortBy { case (p, c) => (-c, p) }.head
    assert(rows.head.getAs[String]("merged") === bestPair)
    assert(rows.head.getAs[Long]("cnt") === bestCnt)
  }

  test("q_mmr_diversify reproduces a driver-side greedy MMR walk") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.TextQueries.mmrDiversify.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("sel_rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("mmr_e4")))
    assert(got.map(_._1).toSeq === (1L to 5L))
    // rebuild candidates + sims on the driver and re-run the greedy loop
    val cand = graft.queries.TextQueries.bm25Topk.run(spark, dir)
      .orderBy(col("score_e4").desc, col("doc_id")).limit(20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_e4"))
    val toks = graft.Tables.documents(spark, dir)
      .where(col("doc_id").isin(cand.map(_._1): _*))
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("tk"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[String](1).toSet).toMap
    def sim(a: Long, b: Long): Long = {
      val (x, y) = (toks(a), toks(b))
      val inter = (x & y).size.toLong
      inter * 10000L / (x.size + y.size - inter)
    }
    var selected = Vector.empty[Long]
    val expected = (1 to 5).map { _ =>
      val scored = cand.filterNot(c => selected.contains(c._1)).map {
        case (id, rel) =>
          val pen = if (selected.isEmpty) 0L else selected.map(sim(id, _)).max
          (id, rel - pen)
      }
      val (id, mmr) = scored.minBy { case (i, m) => (-m, i) }
      selected :+= id
      (selected.size.toLong, id, mmr)
    }
    assert(got.toSeq === expected, "greedy walk diverged from the query")
  }

  test("q_bpe_encode: merges only ever shorten, bounded by words and chars") {
    val rows = graft.queries.TextQueries.bpeEncode.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = r.getAs[Long]("n_words")
      val toks = r.getAs[Long]("n_bpe_tokens")
      val chars = r.getAs[Long]("n_word_chars")
      assert(toks >= words, s"fewer symbols than words: $r")
      assert(toks <= chars, s"merges cannot add symbols: $r")
      assert(r.getAs[Long]("compression_e4") === chars * 10000 / toks)
    }
    // 3 merges must actually compress SOMETHING
    assert(rows.exists(r =>
      r.getAs[Long]("n_bpe_tokens") < r.getAs[Long]("n_word_chars")))
  }

  test("q_inverted_index: df equals postings length, postings sorted unique") {
    val rows = graft.queries.TextQueries.invertedIndex.run(spark, dir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length.toLong === r.getAs[Long]("df"), s"df != |postings|: $r")
      assert(ids.toSeq === ids.sorted.toSeq, "postings not sorted")
      assert(ids.distinct.length === ids.length, "postings not unique")
    }
    val dfs = rows.map(_.getAs[Long]("df"))
    assert(dfs.sameElements(dfs.sorted.reverse), "terms not ranked by df")
  }

  test("q_weighted_sample: inclusion tracks length weight within binomial noise") {
    val rows = graft.queries.MixQueries.weightedSample.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val sampled = r.getAs[Long]("n_sampled")
      val expected = r.getAs[Long]("sum_weight") / 1000.0
      assert(sampled <= n)
      // 4-sigma binomial envelope around the expected sample size
      val sigma = math.sqrt(expected max 1.0)
      assert(math.abs(sampled - expected) <= 4 * sigma + 1,
        s"sample size off: got $sampled expected ~$expected in $r")
    }
  }

  test("corpus_split assignment is a pure function of doc_id (stable under re-run)") {
    val a = MixQueries.corpusSplit.run(spark, dir).collect().map(_.toString).sorted
    val b = MixQueries.corpusSplit.run(spark, dir).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
