package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.PrefixOps
import graft.queries.PackDoc

/** Randomized equivalence for the two-pass distributed prefix sum:
  * ScalaCheck-built keyed streams (skewed key histograms, zero counts,
  * singleton keys, one giant key) against the sequential fold, across
  * several partition counts — the property the two-pass offset algebra
  * must satisfy regardless of where range boundaries land (fixed seed →
  * reproducible). */
class PrefixOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("cumBefore equals the sequential per-key fold on random skewed streams") {
    // key histogram deliberately skewed: key "hot" gets ~70% of rows
    val keyGen = Gen.frequency(
      7 -> Gen.const("hot"),
      2 -> Gen.oneOf("warm1", "warm2", "warm3"),
      1 -> Gen.oneOf((0 until 20).map(i => s"cold$i")))
    val rowsGen = Gen.listOfN(3000, Gen.zip(keyGen, Gen.chooseNum(0L, 9L)))
      .map(_.zipWithIndex.map { case ((k, n), i) => PackDoc(k, i.toLong, n) })

    for (seed <- Seq(11L, 42L); parts <- Seq(1, 3, 16, 64)) {
      val rows = sample(rowsGen, seed)
      val want: Map[Long, Long] = rows.groupBy(_.source).flatMap { case (_, ds) =>
        var acc = 0L
        ds.sortBy(_.doc_id).map { d =>
          val o = d.doc_id -> acc; acc += d.n_tokens; o
        }
      }
      val got = PrefixOps.cumBefore(spark.createDataset(rows), parts)
        .collect().map { case (d, c) => d.doc_id -> c }.toMap
      assert(got == want, s"seed=$seed parts=$parts")
    }
  }

  test("cumBefore handles empty input and all-zero counts") {
    assert(PrefixOps.cumBefore(
      spark.emptyDataset[PackDoc], 8).collect().isEmpty)
    val zeros = (0L until 100L).map(i => PackDoc(s"k${i % 3}", i, 0L))
    val got = PrefixOps.cumBefore(spark.createDataset(zeros), 8).collect()
    assert(got.length == 100 && got.forall(_._2 == 0L))
  }
}
