package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.MixQueries

/** Properties of the dataset-assembly queries (decontamination, packing,
  * mixture sampling, curriculum binning) at sf0.001 — the value-exact
  * checks run against DuckDB via the Verify gate; these pin the invariants
  * that must hold at any scale. */
class MixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("decontaminate: benchmark rows are excluded and flags match counts") {
    val out = MixQueries.decontaminate.run(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, dir)
    val benchIds = docs.where(col("source") === MixQueries.BenchSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !benchIds.contains(r.getLong(0))))
    assert(out.forall(r => (r.getLong(1) > 0) == (r.getInt(2) == 1)))
  }

  test("decontaminate: a benchmark document's own text is contaminated") {
    // any corpus doc sharing full text with a benchmark doc must be flagged
    val docs = graft.Tables.documents(spark, dir)
    val benchTexts = docs.where(col("source") === MixQueries.BenchSource)
      .select("text").limit(1).collect().map(_.getString(0))
    assume(benchTexts.nonEmpty)
    val out = MixQueries.decontaminate.run(spark, dir)
    val dupIds = docs.where(col("source") =!= MixQueries.BenchSource &&
        col("text") === benchTexts.head)
      .select("doc_id").collect().map(_.getLong(0))
    val flagged = out.where(col("is_contaminated") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // only asserts when such a cross-source exact dup exists in the fixture
    dupIds.foreach(id => assert(flagged.contains(id)))
  }

  test("pack_sequences: offsets are contiguous per source and spans cover n_toks") {
    val rows = MixQueries.packSequences.run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) == expect, s"tok_start gap at doc ${r.getLong(0)}")
        expect += r.getLong(2)
      }
    }
    rows.foreach { r =>
      val (n, start, first, last, nSeqs) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(first == start / MixQueries.PackBudget)
      assert(last == (start + n - 1) / MixQueries.PackBudget)
      assert(nSeqs == last - first + 1 && nSeqs >= 1)
    }
  }

  test("mix_sample: kept rows obey the per-language rate and weights invert it") {
    val rows = MixQueries.mixSample.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val rates = MixQueries.MixRates.toMap
    rows.foreach { r =>
      val (lang, bucket, rate, w) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rate == rates.getOrElse(lang, MixQueries.MixRateDefault).toLong)
      assert(bucket >= 0 && bucket < rate)
      assert(w == 10000L / rate)
    }
  }

  test("mix_sample is deterministic across runs") {
    val a = MixQueries.mixSample.run(spark, dir).collect().toSeq
    val b = MixQueries.mixSample.run(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("quality_curriculum: bins are 1..4 and monotone in quality per source") {
    val rows = MixQueries.qualityCurriculum.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 4))
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val byQuality = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
      val bins = byQuality.map(_.getLong(3))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b },
        "ntile must be non-decreasing in (quality, doc_id) order")
    }
  }
}
