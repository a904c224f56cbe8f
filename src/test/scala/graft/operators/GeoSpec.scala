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

  test("polar domain (|lat| >= 85) stays exact vs brute force: the " +
      "final level's lon cells size off the observed max |lat|, down " +
      "to ONE all-longitude cell when cos(lat) can no longer bound " +
      "lon coverage") {
    // pole-adjacent corpus: at lat 89, 500 km spans ~128 degrees of
    // longitude, and at 89.9 every longitude can qualify — the fixed
    // 12-degree lon cell of the round-8 final level would silently
    // MISS nearest suppliers here (wrong, not merely slow). Positions
    // include duplicate (slat, slon) rows to exercise the dedup arm's
    // min-key representative at the same time.
    val supp = Seq(
      (11L, 89.0, 10.0), (12L, 89.0, 170.0), (13L, 88.5, -100.0),
      (14L, 86.0, 55.0), (15L, 89.9, -179.0), (16L, 89.0, 10.0),
      (17L, -89.5, 0.0), (18L, -86.0, 120.0), (19L, 40.0, 20.0))
      .toDF("s_suppkey", "slat", "slon")
    val cust = Seq(
      (1L, 89.5, -170.0), (2L, 88.0, 60.0), (3L, 89.9, 5.0),
      (4L, 85.5, 54.0), (5L, -89.0, 90.0), (6L, -85.0, 119.0),
      (7L, 40.5, 19.0), (8L, 0.0, 0.0))
      .toDF("c_custkey", "clat", "clon")
    val pruned = Geo.nearestSupplierDf(cust, supp)
    val exhaustive = cust.crossJoin(supp)
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
    // the duplicate-position pair (11, 16) must resolve to min key 11
    // (customer 2's nearest is that shared position; the exhaustive
    // side tie-breaks identically, so set equality above already
    // covers it — this pins the intent explicitly)
    val byCust = pruned.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCust.get(2L).contains(11L))
  }

  test("duplicate-position customers share one cascade probe and fan " +
      "back out to every key (dedup-first exactness)") {
    val supp = Seq((1L, 10.0, 20.0), (2L, 10.0, 23.0))
      .toDF("s_suppkey", "slat", "slon")
    // three customers at the SAME position + one distinct
    val cust = Seq((7L, 10.0, 21.0), (8L, 10.0, 21.0), (9L, 10.0, 21.0),
      (10L, 10.0, 22.5)).toDF("c_custkey", "clat", "clon")
    val out = Geo.nearestSupplierDf(cust, supp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out === Seq((7L, 1L), (8L, 1L), (9L, 1L), (10L, 2L)))
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
