package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Orchestration-loop parity: claim-first semantics, idle cycles, and the
  * one-file-per-cycle cadence. */
class FoodOrdersDriverSpec extends SparkTestBase {

  test("cycle with no file senses nothing and does not fail") {
    val in = Files.createTempDirectory("drv-in")
    val out = Files.createTempDirectory("drv-out")
    val cfg = FoodOrdersDriver.Config(in.toString, out.toString)
    assert(FoodOrdersDriver.runCycle(spark, cfg).isEmpty)
  }

  test("cycle claims exactly one file, processes it, moves it to processed/") {
    val in = Files.createTempDirectory("drv-in")
    val out = Files.createTempDirectory("drv-out")
    Files.copy(Paths.get(resource("food_daily.csv")),
      in.resolve("food_daily_a.csv"))
    Files.copy(Paths.get(resource("food_daily.csv")),
      in.resolve("food_daily_b.csv"))

    val cfg = FoodOrdersDriver.Config(in.toString, out.toString)
    val c1 = FoodOrdersDriver.runCycle(spark, cfg)
    assert(c1.contains(FoodOrdersJob.Counts(891, 869, 22)))
    // first (lexicographic) file claimed; second still pending
    assert(Files.exists(in.resolve("processed/food_daily_a.csv")))
    assert(Files.exists(in.resolve("food_daily_b.csv")))

    val c2 = FoodOrdersDriver.runCycle(spark, cfg)
    assert(c2.contains(FoodOrdersJob.Counts(891, 869, 22)))
    assert(Files.exists(in.resolve("processed/food_daily_b.csv")))
    // both runs appended to the same branch-partitioned table
    assert(spark.read.parquet(s"$out/branch=delivered").count() === 2 * 869)

    val c3 = FoodOrdersDriver.runCycle(spark, cfg)
    assert(c3.isEmpty)
  }

  test("CLI parsing covers the reference's parameter contract") {
    val cfg = FoodOrdersDriver.parse(
      Array("/in", "/out", "orders_", "--cycles", "3", "--interval-ms", "50"))
    assert(cfg === FoodOrdersDriver.Config("/in", "/out", "orders_", 3, 50))
    assert(FoodOrdersDriver.parse(Array("/in", "/out", "--once")).cycles === 1)
  }
}
