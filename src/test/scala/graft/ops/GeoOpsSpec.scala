package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(GeoOps.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .head().getDouble(0)

  test("haversine: identical points are 0 km") {
    assert(hav(42.5, 17.25, 42.5, 17.25) === 0.0)
  }

  test("haversine: one degree of longitude at the equator ≈ 111.19 km") {
    assert(math.abs(hav(0, 0, 0, 1) - 111.1949) < 0.01)
  }

  test("haversine: poles are ~20015 km apart (half circumference)") {
    assert(math.abs(hav(90, 0, -90, 0) - math.Pi * 6371.0) < 0.01)
  }

  test("haversine: symmetric and bounded (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 40).map { i =>
      (i.toLong, rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179,
        rnd.nextDouble() * 178 - 89, rnd.nextDouble() * 358 - 179)
    }
    val df = pts.toDF("i", "lat1", "lon1", "lat2", "lon2")
      .select(
        GeoOps.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("d1"),
        GeoOps.haversineKm(col("lat2"), col("lon2"), col("lat1"), col("lon1")).as("d2"))
    df.collect().foreach { r =>
      val (d1, d2) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(d1 - d2) < 1e-9)
      assert(d1 >= 0 && d1 <= math.Pi * 6371.0 + 1e-6)
    }
  }

  private val zones = Seq(
    (0L, "Z0", 0.0, 0.0), (1L, "Z1", 40.0, 10.0), (2L, "Z2", -30.0, 150.0))
    .toDF("zone_id", "zone_name", "lat_z", "lon_z")

  test("nearestZone picks the true argmin (matches window formulation)") {
    val pts = Seq((1L, 1.0, 1.0), (2L, 39.0, 12.0), (3L, -28.0, 149.0), (4L, 89.0, 0.0))
      .toDF("id", "lat", "lon")
    val fast = GeoOps.nearestZone(pts, zones, "lat", "lon")
      .select("id", "zone_id", "zone_name").orderBy("id").collect().toSeq
    val ref = GeoOps.nearestZoneViaWindow(pts, zones, "id", "lat", "lon")
      .select("id", "zone_id", "zone_name").orderBy("id").collect().toSeq
    assert(fast === ref)
    assert(fast.map(r => r.getLong(0) -> r.getString(2)).toMap ===
      Map(1L -> "Z0", 2L -> "Z1", 3L -> "Z2", 4L -> "Z1"))
  }

  test("nearestZone dist_km equals direct haversine to the chosen zone") {
    val pts = Seq((1L, 10.0, 20.0)).toDF("id", "lat", "lon")
    val row = GeoOps.nearestZone(pts, zones, "lat", "lon").head()
    val d = hav(10.0, 20.0, 0.0, 0.0) // Z0 nearest
    assert(row.getAs[String]("zone_name") === "Z0")
    assert(row.getAs[Double]("dist_km") === d)
  }

  test("nearestZone ties break to lowest zone_id") {
    val twin = Seq((0L, "A", 10.0, 0.0), (1L, "B", 10.0, 0.0), (7L, "C", 10.0, 0.0))
      .toDF("zone_id", "zone_name", "lat_z", "lon_z")
    val out = GeoOps.nearestZone(Seq((1L, 10.0, 0.5)).toDF("id", "lat", "lon"),
      twin, "lat", "lon").head()
    assert(out.getAs[Long]("zone_id") === 0L)
  }

  test("nearestZone: null coordinates produce null zone columns") {
    val pts = Seq((1L, Some(10.0), Some(0.5)), (2L, None, Some(1.0)))
      .toDF("id", "lat", "lon")
    val out = GeoOps.nearestZone(pts, zones, "lat", "lon")
      .orderBy("id").select("zone_id").collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }

  test("distanceBandJoin finds exactly the pairs within radius") {
    val left = Seq((1L, 0.0, 0.0), (2L, 0.0, 3.0)).toDF("lid", "lat_l", "lon_l")
    val right = Seq((10L, 0.05, 0.05), (11L, 50.0, 50.0)).toDF("rid", "lat_r", "lon_r")
    val got = GeoOps.distanceBandJoin(left, right, radiusKm = 20.0)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  test("distanceBandJoin finds pairs straddling the ±180° antimeridian") {
    val left = Seq((1L, 0.0, 179.9)).toDF("lid", "lat_l", "lon_l")
    val right = Seq((10L, 0.0, -179.9), (11L, 0.0, 170.0)).toDF("rid", "lat_r", "lon_r")
    val got = GeoOps.distanceBandJoin(left, right, radiusKm = 50.0)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L))) // 0.2° apart across the seam ≈ 22 km
  }
}
