package graft

import graft.ops.{DedupOps, TextOps}
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** Adversarial hot-bucket stress for the banded MinHash-LSH path (r10/r11
  * verdict: "the Σ n_b² envelope is asserted, never stressed"). Fixture: a
  * hot cluster of identical documents — every band key collides, the
  * worst case the banding admits — plus a distinct random tail.
  *
  * Pins three facts:
  *  1. the candidate set EQUALS the Σ_bucket C(n_b,2) envelope (deduped
  *     across bands) computed independently on the driver — the join
  *     never manufactures pairs beyond bucket membership;
  *  2. the pipeline stays correct under the blow-up: all hot pairs
  *     verify at Jaccard 1.0 and survive, tail pairs don't appear;
  *  3. the production composition neutralizes the adversary: exact
  *     dedup FIRST (hash-groupBy, one shuffle) collapses the hot
  *     cluster to one representative, after which the banded pass sees
  *     no hot bucket at all — the quadratic term is gone, which is the
  *     documented answer to "identical docs are irreducibly quadratic
  *     in any pair-listing formulation".
  */
class BandedSkewStressSpec extends SparkSpec {
  import DedupQueries.{NumBands, NumPerms, RowsPerBand, ShingleK}

  private val HotN = 300
  private val TailN = 700

  /** Deterministic fixture: HotN copies of one 40-token doc (ids 0..299),
    * TailN distinct docs of seeded pseudo-random 30-token text. */
  private lazy val fixture = {
    val rnd = new scala.util.Random(42)
    val hotText = (0 until 40).map(i => s"hot$i").mkString(" ")
    val hot = (0 until HotN).map(i => (i.toLong, hotText))
    val tail = (0 until TailN).map { i =>
      val toks = (0 until 30).map(_ => s"w${rnd.nextInt(50000)}")
      ((HotN + i).toLong, toks.mkString(" "))
    }
    import spark.implicits._
    (hot ++ tail).toDF("doc_id", "text")
  }

  private def bandedFrame(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), TextOps.shingleHashes(col("text"), ShingleK).as("hs"))
      .where(size(col("hs")) > 0)
      .withColumn("sig", DedupOps.minhashSignature(col("hs"), NumPerms))
      .withColumn("bands", DedupOps.lshBandKeys(col("sig"), NumBands, RowsPerBand))
      .select(col("doc_id"), explode(col("bands")).as("bk"))

  test("candidate set equals the independently computed bucket-membership envelope") {
    val banded = bandedFrame(fixture).persist()
    val got = DedupOps.bucketPairs(banded, "doc_id", "bk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // independent driver-side envelope: distinct same-bucket pairs
    val byBucket = banded.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = byBucket.values.flatMap { ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    assert(got == want)
    // the hot cluster is fully dense in the candidate set: C(HotN, 2)
    val hotPairs = got.count { case (l, r) => l < HotN && r < HotN }
    assert(hotPairs == HotN * (HotN - 1) / 2)
  }

  test("verification stays exact under the hot-bucket blow-up") {
    val pairs = DedupQueries.minhashPairsFor(fixture, DedupQueries.JaccardThreshold)
      .select(col("id_l"), col("id_r"),
        round(col("jac") * 10000).cast("long").as("jac_e4"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    // every verified pair is hot-hot at exactly Jaccard 1; all C(HotN,2)
    // of them survive; no tail doc sneaks in
    assert(pairs.length == HotN * (HotN - 1) / 2)
    assert(pairs.forall { case ((l, r), j) => l < HotN && r < HotN && j == 10000L })
  }

  test("exact-dedup-first composition removes the hot bucket entirely") {
    val canonical = DedupOps.exactDupRank(fixture, md5(col("text")), col("doc_id"))
      .where(col("dup_rank") === 1).select("doc_id", "text")
    assert(canonical.count() == 1 + TailN)
    val banded = bandedFrame(canonical).persist()
    val candN = DedupOps.bucketPairs(banded, "doc_id", "bk").count()
    // with the hot cluster collapsed to one representative, the candidate
    // space is only incidental tail collisions — orders of magnitude below
    // the raw envelope (and the near-dup output itself is empty: the tail
    // is random text)
    assert(candN < HotN.toLong * (HotN - 1) / 20)
    val survivors = DedupQueries.minhashPairsFor(canonical, DedupQueries.JaccardThreshold)
    assert(survivors.count() == 0)
  }
}
