package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GeoSpec extends SparkTestBase {
  import spark.implicits._

  test("cell-pruned nearest-supplier equals the exhaustive cross join") {
    val pruned = Geo.nearestSupplier(spark, sf0001)
    // same semantics, no pruning: every (customer, supplier) pair scored
    val c = Geo.custGeo(spark, sf0001)
    val s = Geo.suppGeo(spark, sf0001)
    val exhaustive = c.crossJoin(s)
      .select($"c_custkey", $"s_suppkey",
        round(Geo.haversineKm($"clat", $"clon", $"slat", $"slon"), 4)
          .as("dist"))
      .filter($"dist" <= Geo.RadiusKm)
      .groupBy($"c_custkey")
      .agg(min(struct($"dist", $"s_suppkey")).as("m"))
      .select($"c_custkey", $"m.s_suppkey".as("nearest_supp"),
        $"m.dist".as("dist_km"))
    assert(pruned.exceptAll(exhaustive).isEmpty &&
      exhaustive.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("haversine: known distances and antimeridian periodicity") {
    val df = Seq((0.0, 0.0, 0.0, 90.0), (51.5, -0.1, 48.9, 2.3),
      (10.0, 179.5, 10.0, -179.5)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm($"a", $"b", $"c", $"d").as("km"))
    val r = df.collect().map(_.getDouble(0))
    // quarter meridian ≈ 10007 km; London→Paris ≈ 340 km
    assert(math.abs(r(0) - 10007.5) < 5.0, s"quarter ${r(0)}")
    assert(math.abs(r(1) - 340.0) < 15.0, s"ldn-par ${r(1)}")
    // 1° of longitude at lat 10 across the antimeridian ≈ 109.6 km, not
    // the 359°-apart great arc
    assert(r(2) < 120.0, s"antimeridian ${r(2)}")
  }
}
