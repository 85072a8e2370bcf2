package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.AsOfJoin

/** Randomized equivalence: the custom BroadcastAsOfJoinExec against a
  * brute-force Scala reference (for every probe, linear-scan the timeline
  * for the greatest ts ≤ probe-ts with equal key), over ScalaCheck-built
  * timelines with duplicate keys, boundary ties, empty keys and probes
  * outside the timeline range (fixed seed → reproducible). */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A]): A =
    g.apply(Gen.Parameters.default, Seed(7L)).get

  test("custom operator equals brute-force linear scan on random timelines") {
    val tsGen = Gen.chooseNum(0L, 1000L)
    val keyGen = Gen.chooseNum(0L, 8L)
    // timeline unique per (key, ts) — dedup below, matching the contract
    val timelineGen = Gen.listOfN(120, Gen.zip(keyGen, tsGen))
      .map(_.distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })
    val probesGen = Gen.listOfN(300, Gen.zip(keyGen, Gen.chooseNum(-50L, 1100L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })

    val timeline = sample(timelineGen)
    val probes = sample(probesGen)

    def toTs(v: Long) = new Timestamp(v * 1000L)
    val tlDf = timeline.map { case (k, t, v) => (k, toTs(t), v) }
      .toDF("k", "rts", "payload")
    val prDf = probes.map { case (id, k, t) => (id, k, toTs(t)) }
      .toDF("id", "k", "lts")

    val got = AsOfJoin(prDf, tlDf, Seq("k"), "lts", "rts", Seq("payload"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap

    val byKey = timeline.groupBy(_._1)
    val want = probes.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Nil).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap

    assert(got.size == probes.size)
    want.foreach { case (id, exp) =>
      assert(got(id) == exp, s"probe $id: got ${got(id)}, want $exp")
    }
  }
}
