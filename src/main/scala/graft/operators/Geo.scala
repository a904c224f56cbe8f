package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial joins over the star schema. The reference pipeline is a food-
  * delivery ETL (SURVEY §1) yet never computes a distance; nearest-facility
  * assignment is the obvious next query over such data, so it joins the
  * extension surface with the scale-correct shape: a CASCADED grid join
  * whose cell size adapts to supplier density, not the quadratic cross
  * join the oracle runs.
  *
  * Coordinates are synthesized deterministically from the keys (integer
  * modulo arithmetic then one decimal scale — bit-identical in any IEEE
  * engine), lat ∈ [-60, 60), lon ∈ [-180, 180).
  */
object Geo {

  val EarthKm = 6371.0
  val KmPerDeg = EarthKm * math.Pi / 180 // ≈ 111.195 km per great-circle °
  val RadiusKm = 500.0
  // COMPLETE coarse level: the 3×3 neighborhood is a SUPERSET of the
  // radius for the data's |lat| ≤ 60 bound: lat 500 km / 111.19 km-per-
  // deg = 4.5° ≤ 5°; lon worst case 500 / (111.19·cos60°) = 9.0° ≤ 12°.
  val LatCell = 5.0
  val LonCell = 12.0

  def custGeo(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      (((col("c_custkey") * 37) % 1200) / 10.0 - 60.0).as("clat"),
      (((col("c_custkey") * 73) % 3600) / 10.0 - 180.0).as("clon"))

  def suppGeo(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(col("s_suppkey"),
      (((col("s_suppkey") * 41) % 1200) / 10.0 - 60.0).as("slat"),
      (((col("s_suppkey") * 89) % 3600) / 10.0 - 180.0).as("slon"))

  /** Great-circle distance (haversine), km. Plain builtin trig — stays in
    * whole-stage codegen. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column)
      : Column = {
    val dphi = radians(lat2 - lat1) / 2
    val dlam = radians(lon2 - lon1) / 2
    val h = sin(dphi) * sin(dphi) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dlam) * sin(dlam)
    lit(2 * EarthKm) * asin(sqrt(h))
  }

  /** Nearest supplier within 500 km of each customer.
    *
    * Scale shape — a CASCADE of grid joins, finest first:
    *
    *  - The old single-level form (suppliers ×9-exploded into a FIXED
    *    5°/12° grid and broadcast) carried two scale killers the ×16
    *    bench convicted at 44× time for 16× data: the broadcast side
    *    grew with the supplier table, and fixed cells mean per-cell
    *    density grows linearly with the corpus, so candidate pairs grow
    *    quadratically.
    *  - Now: cell size ADAPTS to supplier density (side ∝ √(1/n_supp),
    *    from one count aggregate — driver-side metadata, not data), so
    *    a fine cell holds O(1) suppliers at ANY corpus size. Customers
    *    explode ×9 into their probe stencil (suppliers keep ONE row per
    *    level) and the join is a plain shuffle hash join on
    *    (cell_lat, cell_lon) — no broadcast anywhere.
    *  - A fine level cannot SEE the whole 500 km radius, so it resolves
    *    a customer only when its found minimum is PROVABLY global: the
    *    3×3 stencil covers every point within g = min(latKm-per-cell,
    *    lon-coverage at this row's latitude); a found min m ≤ g − 1 mm
    *    beats everything outside the stencil. At realistic density
    *    almost every customer's nearest is well inside g, so each level
    *    resolves the bulk and passes a shrinking straggler set down;
    *    the FINAL level is the radius-complete 5°/12° grid, so the
    *    cascade is exact — bit-identical to the cross-join oracle.
    *
    * Lon-coverage bound (per row): with both endpoints' |lat| ≤
    * |clat| + s_lat, haversine gives d ≥ 2R·asin(cos(maxlat)·sin(Δλ/2)),
    * so d ≤ 2R·asin(cos(maxlat)·sin(s_lon/2)) forces Δλ ≤ s_lon — one
    * cell width, inside the 3×3.
    *
    * Distances are rounded to 4 decimals BEFORE both the radius filter
    * and the argmin so boundary and tie decisions are identical
    * cross-engine (resolution compares m ≤ g − 0.001: an out-of-stencil
    * supplier's true distance > g rounds to ≥ g − 0.00005 > m, so it
    * can neither beat nor tie a resolved min); min(struct(dist, key))
    * makes the nearest pick total-order deterministic. */
  def nearestSupplier(s: SparkSession, d: String): DataFrame =
    nearestSupplierDf(custGeo(s, d), suppGeo(s, d))

  /** [[nearestSupplier]] over arbitrary (c_custkey, clat, clon) /
    * (s_suppkey, slat, slon) frames — exposed for the cascade spec
    * (multi-level equality vs brute force on a dense synthetic corpus). */
  private[graft] def nearestSupplierDf(custIn: DataFrame,
      suppIn: DataFrame): DataFrame = {
    val supp = suppIn.localCheckpoint() // re-keyed per level
    val cust = custIn
    // adaptive fine-cell side: lat ∈ [-60,60) × lon ∈ [-180,180) is
    // 43200 deg²; side s with lon cells 2.4× wider puts ~6 expected
    // suppliers in a 3×3 stencil at 9·2.4·s²·(n/43200) = 6 → s =
    // √(12000/n). One count() — O(1) metadata to the driver.
    val nSupp = supp.count()
    val sFine = math.sqrt(12000.0 / math.max(nSupp, 1L)) max 0.02
    // cascade: fine, geometric mid, then the radius-complete 5°/12°
    // grid. A level joins the list only when it at least HALVES the
    // coarse cell side — a barely-finer level costs a full extra
    // join/aggregate/anti-join round for almost no candidate pruning
    // (at sf0.1 the 3.46° level tripled wall time to save nothing)
    val levels = (Seq(sFine, math.sqrt(sFine * LatCell))
      .filter(_ <= LatCell / 2) :+ LatCell).distinct

    def cellKeys(latC: Column, lonC: Column, sLat: Double, sLon: Double,
        lonCells: Long): (Column, Column) =
      (floor(latC / sLat), pmod(floor(lonC / sLon), lit(lonCells)))

    var unresolved = cust
    var done = false
    var out: DataFrame = null
    levels.zipWithIndex.foreach { case (sLat, li) =>
      if (!done) {
      val isLast = li == levels.size - 1
      val lonCells = math.ceil(360.0 / (2.4 * sLat)).toLong max 1L
      val sLon = 360.0 / lonCells
      val (sCellLat, sCellLon) =
        cellKeys(col("slat"), col("slon"), sLat, sLon, lonCells)
      // the 3×3 stencil explodes the SUPPLIER side (facilities — the
      // smaller table in this query's semantics and in the schema):
      // customers shuffle one probe row each, suppliers nine
      val sc = supp
        .withColumn("dlat", explode(array((-1 to 1).map(lit): _*)))
        .withColumn("dlon", explode(array((-1 to 1).map(lit): _*)))
        .select(col("s_suppkey"), col("slat"), col("slon"),
          (sCellLat + col("dlat")).as("cell_lat"),
          pmod(sCellLon + col("dlon"), lit(lonCells)).as("cell_lon"))
      val (cCellLat, cCellLon) =
        cellKeys(col("clat"), col("clon"), sLat, sLon, lonCells)
      val probes = unresolved
        .select(col("c_custkey"), col("clat"), col("clon"),
          cCellLat.as("cell_lat"),
          pmod(cCellLon, lit(lonCells)).as("cell_lon"))
      val best = probes.join(sc, Seq("cell_lat", "cell_lon"))
        .select(col("c_custkey"), col("clat"), col("clon"),
          col("s_suppkey"),
          round(haversineKm(col("clat"), col("clon"), col("slat"),
            col("slon")), 4).as("dist"))
        .groupBy(col("c_custkey"), col("clat"), col("clon"))
        .agg(min(struct(col("dist"), col("s_suppkey"))).as("m"))
      val found = best.select(col("c_custkey"),
        col("m.s_suppkey").as("nearest_supp"), col("m.dist").as("dist_km"))
      val resolved =
        if (isLast) found // complete level: the stencil covers 500 km
        else {
          // per-row provable-global bound g (see scaladoc)
          val gLat = KmPerDeg * sLat
          val gLon = lit(2 * EarthKm) * asin(
            greatest(cos(radians(abs(col("clat")) + lit(sLat))), lit(0.0)) *
              math.sin(math.toRadians(sLon) / 2))
          best.filter(col("m.dist") <= least(lit(gLat), gLon) - 0.001)
            .select(col("c_custkey"), col("m.s_suppkey").as("nearest_supp"),
              col("m.dist").as("dist_km"))
        }
      val emitted = resolved.filter(col("dist_km") <= RadiusKm)
      out = if (out == null) emitted else out.unionByName(emitted)
      if (!isLast) {
        unresolved = unresolved
          .join(resolved.select(col("c_custkey")), Seq("c_custkey"),
            "left_anti")
          .localCheckpoint() // truncate the cascade's lineage
        // a fully-resolved level ends the cascade — the checkpoint is
        // already materialized, so the emptiness read is free
        if (unresolved.isEmpty) done = true
      }
      }
    }
    out
  }
}
