package graft

import org.apache.spark.sql.functions._
import graft.ops.GeoJoin

class GeoJoinSpec extends SparkSuite {
  import spark.implicits._

  private def havKm(lat1: Double, lon1: Double,
                    lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2.0 * 6373.0 * math.asin(math.sqrt(a))
  }

  test("radiusPairs = brute force on a pseudo-random scatter") {
    val pts = (1 to 300).map { i =>
      val lat = (i * 37 % 150) - 75 + 0.3
      val lon = (i * 91 % 360) - 180 + 0.7
      (i.toLong, lat.toDouble, lon.toDouble)
    }
    val r = 800.0
    val got = GeoJoin.radiusPairs(
        pts.toDF("id", "lat", "lon").repartition(6), "id", "lat", "lon",
        radiusKm = r, maxAbsLat = 80.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = (for {
      (i, la1, lo1) <- pts; (j, la2, lo2) <- pts if i < j
      d = BigDecimal(havKm(la1, lo1, la2, lo2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if d <= r
    } yield (i, j)).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("antimeridian pairs are found through the lon ring wrap") {
    val pts = Seq((1L, 10.0, 179.8), (2L, 10.0, -179.8), (3L, 10.0, 0.0))
    val got = GeoJoin.radiusPairs(pts.toDF("id", "lat", "lon"),
        "id", "lat", "lon", radiusKm = 100.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L))) // ~44 km apart across the antimeridian
  }

  test("seam band at high latitude = brute force (uniform ring, no narrow seam cell)") {
    // Regression for the ceil'd ring bug: with nLon = ceil(360/dLon) the
    // last lon cell is narrower than dLon, so a close pair straddling
    // ±180° at high latitude can land 2 ring cells apart and escape the
    // ±1 probe. The scatter concentrates on the seam band |lon| > 150 at
    // lat 70..79.5, where lon cells are widest relative to the radius.
    val pts = (1 to 400).map { i =>
      val lat = 70.0 + (i * 53 % 96) / 10.0          // 70.0 .. 79.5
      val lonMag = 150.0 + (i * 29 % 300) / 10.0     // 150.0 .. 179.9
      val lon = if (i % 2 == 0) lonMag else -lonMag
      (i.toLong, lat, lon)
    }
    for (r <- Seq(97.5, 300.0, 800.0)) {
      val got = GeoJoin.radiusPairs(
          pts.toDF("id", "lat", "lon").repartition(6), "id", "lat", "lon",
          radiusKm = r, maxAbsLat = 80.0)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val brute = (for {
        (i, la1, lo1) <- pts; (j, la2, lo2) <- pts if i < j
        d = BigDecimal(havKm(la1, lo1, la2, lo2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if d <= r
      } yield (i, j)).toSet
      assert(got == brute, s"radius $r")
      assert(got.nonEmpty, s"radius $r")
    }
  }

  test("null and out-of-bound coordinates are dropped, not joined") {
    val pts = Seq((1L, Some(85.0), 0.0), (2L, Some(84.9), 0.0),
      (3L, None, 0.0), (4L, Some(10.0), 0.0), (5L, Some(10.1), 0.0))
    val got = GeoJoin.radiusPairs(
        pts.toDF("id", "lat", "lon"), "id", "lat", "lon",
        radiusKm = 200.0, maxAbsLat = 80.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((4L, 5L))) // 1,2 out of bound; 3 null
  }
}
