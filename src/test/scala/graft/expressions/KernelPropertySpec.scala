package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Randomized equivalence checks: every custom codegen kernel against a
  * plain-Scala reference formulation, over ScalaCheck-generated inputs
  * (fixed seed → reproducible). Inputs are evaluated in ONE DataFrame pass
  * so the whole suite stays fast while covering hundreds of cases. */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L
  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  private def hashP(s: String): Long =
    TextHashExprs.hashP(UTF8String.fromString(s))

  test("MinHashSig equals the per-permutation min of (a*h+b) mod P") {
    val gen = Gen.listOfN(150, Gen.nonEmptyListOf(Gen.chooseNum(0L, P - 1)))
    val cases = sample(gen)
    val nPerm = 16
    val got = cases.zipWithIndex.toDF("hs", "i")
      .select($"i", F.minhash($"hs", nPerm).as("sig"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1).map(_._2)
    val want = cases.map { hs =>
      (0 until nPerm).map { i =>
        val a = 2L * i + 1L
        val b = (i * 2654435761L) % P
        hs.map(h => (a * math.floorMod(h, P) + b) % P).min
      }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("SimHash equals the sign-of-bit-count-sum fold") {
    val gen = Gen.listOfN(150, Gen.nonEmptyListOf(Gen.chooseNum(0L, Long.MaxValue)))
    val cases = sample(gen)
    val nBits = 32
    val got = cases.zipWithIndex.toDF("hs", "i")
      .select($"i", F.simhash($"hs", nBits).as("fp"))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val want = cases.map { hs =>
      (0 until nBits).map { j =>
        val s = hs.map(h => 2L * ((h >>> j) & 1L) - 1L).sum
        if (s > 0) 1L << j else 0L
      }.sum
    }
    assert(got.toSeq == want)
  }

  test("ShingleHashSet equals distinct hashP over joined k-shingles") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val gen = Gen.listOfN(100, Gen.listOfN(12, word))
    val cases = sample(gen)
    val k = 3
    val got = cases.zipWithIndex.toDF("toks", "i")
      .select($"i", F.shingleHashes($"toks", k).as("hs"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1).map(_._2)
    // kernel contract: distinct AND ascending (sorted-merge intersect input)
    val want = cases.map { toks =>
      if (toks.size < k) Seq.empty[Long]
      else toks.sliding(k).map(w => hashP(w.mkString(" "))).toSeq.distinct.sorted
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("IntersectSizeSorted equals Set-intersection size on sorted distinct arrays") {
    val arr = Gen.listOf(Gen.chooseNum(0L, 50L)).map(_.distinct.sorted)
    val gen = Gen.listOfN(200, Gen.zip(arr, arr))
    val cases = sample(gen)
    val got = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select($"i", F.intersectSizeSorted($"a", $"b").as("n"))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong }
    assert(got.toSeq == want)
  }

  test("PolyFold equals the sequential (h*31 + x) mod P fold") {
    val gen = Gen.listOfN(200, Gen.listOf(Gen.chooseNum(0L, P - 1)))
    val cases = sample(gen)
    val got = cases.zipWithIndex.toDF("xs", "i")
      .select($"i", F.polyFold($"xs").as("fp"))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val want = cases.map(_.foldLeft(0L)((h, x) => (h * 31 + x) % P))
    assert(got.toSeq == want)
  }

  test("StopwordCount equals the filter-count formulation") {
    val words = Seq("the", "and", "of", "to")
    val tok = Gen.oneOf("the", "and", "of", "to", "cat", "dog", "xyz")
    val gen = Gen.listOfN(200, Gen.listOf(tok))
    val cases = sample(gen)
    val got = cases.zipWithIndex.toDF("toks", "i")
      .select($"i", F.stopwordCount($"toks", words).as("n"))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val want = cases.map(_.count(words.contains).toLong)
    assert(got.toSeq == want)
  }

  test("DotProduct equals the double-accumulated float dot product") {
    val f = Gen.chooseNum(-100, 100).map(i => i / 10.0f)
    val vec = Gen.listOfN(8, f)
    val gen = Gen.listOfN(150, Gen.zip(vec, vec))
    val cases = sample(gen)
    val got = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select($"i", F.dot($"a", $"b").as("d"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val want = cases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("NearestZone equals brute-force haversine argmin over random coords") {
    // random points incl. near-pole and near-antimeridian; random zone dim
    val latG = Gen.chooseNum(-899, 899).map(_ / 10.0)
    val lonG = Gen.chooseNum(-1800, 1799).map(_ / 10.0)
    val zones = sample(Gen.listOfN(15, Gen.zip(latG, lonG)))
      .zipWithIndex.map { case ((la, lo), i) => (i.toLong, s"z$i", la, lo) }
    val pts = sample(Gen.listOfN(200, Gen.zip(latG, lonG)))
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val (f1, f2) = (math.toRadians(lat1), math.toRadians(lat2))
      val (dF, dL) = (math.toRadians(lat2 - lat1), math.toRadians(lon2 - lon1))
      val a = math.pow(math.sin(dF / 2), 2) +
        math.cos(f1) * math.cos(f2) * math.pow(math.sin(dL / 2), 2)
      2 * 6371.0 * math.asin(math.sqrt(a))
    }
    val got = pts.zipWithIndex.map { case ((la, lo), i) => (i, la, lo) }
      .toDF("i", "lat", "lon")
      .select($"i", F.nearestZone($"lat", $"lon",
        zones.map(_._1).toArray, zones.map(_._2).toArray,
        zones.map(_._3).toArray, zones.map(_._4).toArray).as("best"))
      .select($"i", $"best.zone_id")
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val want = pts.map { case (la, lo) =>
      zones.map(z => (hav(la, lo, z._3, z._4), z._1)).minBy(identity)._2
    }
    assert(got.toSeq == want)
  }

  test("hamming column formulation equals Long.bitCount of xor") {
    val gen = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(0L, Long.MaxValue), Gen.chooseNum(0L, Long.MaxValue)))
    val cases = sample(gen)
    val got = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select($"i", graft.ops.DedupOps.hamming($"a", $"b", 63).as("d"))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    val want = cases.map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }
    assert(got.toSeq == want)
  }
}
