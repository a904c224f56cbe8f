package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Smoke sweep with REAL data: every driver-contract query must execute
  * at sf0.001 without throwing. The DuckDB oracle gate runs at sf0.01
  * out-of-process; this in-process sweep catches data-dependent breakage
  * (a filter that empties, a head() on a missing group, a codec arm
  * tripping on a payload) the moment a query regresses — and unlike
  * EmptyInputSpec, with the distributions the queries were written for. */
class QueriesSmokeSpec extends SparkTestBase {

  test("every contract query runs at sf0.001 and the flagship is non-empty") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, sf0001).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    assert(SparkEntry.entry(spark) .count() > 0)
  }
}
