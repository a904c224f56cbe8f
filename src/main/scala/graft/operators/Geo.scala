package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial joins over the star schema. The reference pipeline is a food-
  * delivery ETL (SURVEY §1) yet never computes a distance; nearest-facility
  * assignment is the obvious next query over such data, so it joins the
  * extension surface with the scale-correct shape: a GRID-CELL bounded
  * join, not the quadratic cross join the oracle runs.
  *
  * Coordinates are synthesized deterministically from the keys (integer
  * modulo arithmetic then one decimal scale — bit-identical in any IEEE
  * engine), lat ∈ [-60, 60), lon ∈ [-180, 180).
  */
object Geo {

  val EarthKm = 6371.0
  val RadiusKm = 500.0
  // Cell sizing must make the 3×3 neighborhood a SUPERSET of the radius:
  // lat: 500 km / 111.19 km-per-deg = 4.5° ≤ 5°; lon: worst case at the
  // |lat| ≤ 60 data bound is 500 / (111.19·cos60°) = 9.0° ≤ 12°.
  val LatCell = 5.0
  val LonCell = 12.0
  val LonCells = 30 // 360 / 12, for antimeridian wraparound

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
    * Scale shape: suppliers (the small side) are EXPANDED ×9 into their
    * 3×3 grid-cell neighborhood (with longitude cells wrapping at the
    * antimeridian — haversine itself is Δλ-periodic, the pruning must be
    * too) and broadcast; customers join on their exact cell. Per customer
    * the candidate set is the ~9-cell neighborhood instead of every
    * supplier — the cross join the DuckDB oracle runs is O(|C|·|S|) and
    * exists precisely to prove the pruned join loses nothing. Distances
    * are rounded to 4 decimals BEFORE both the radius filter and the
    * argmin so the boundary and tie decisions are identical cross-engine;
    * min(struct(dist, key)) makes the nearest pick total-order
    * deterministic. */
  def nearestSupplier(s: SparkSession, d: String): DataFrame = {
    val cells = suppGeo(s, d)
      .withColumn("dlat", explode(array((-1 to 1).map(lit): _*)))
      .withColumn("dlon", explode(array((-1 to 1).map(lit): _*)))
      .select(col("s_suppkey"), col("slat"), col("slon"),
        (floor(col("slat") / LatCell) + col("dlat")).as("cell_lat"),
        pmod(floor(col("slon") / LonCell) + col("dlon") + LonCells / 2,
          lit(LonCells)).as("cell_lon"))
    val cust = custGeo(s, d)
      .withColumn("cell_lat", floor(col("clat") / LatCell))
      .withColumn("cell_lon",
        pmod(floor(col("clon") / LonCell) + LonCells / 2, lit(LonCells)))
    cust.join(broadcast(cells), Seq("cell_lat", "cell_lon"))
      .select(col("c_custkey"), col("s_suppkey"),
        round(haversineKm(col("clat"), col("clon"), col("slat"),
          col("slon")), 4).as("dist"))
      .filter(col("dist") <= RadiusKm)
      .groupBy(col("c_custkey"))
      .agg(min(struct(col("dist"), col("s_suppkey"))).as("m"))
      .select(col("c_custkey"), col("m.s_suppkey").as("nearest_supp"),
        col("m.dist").as("dist_km"))
  }
}
