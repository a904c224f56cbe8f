package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkTestBase}

/** Robustness sweep: every query in the driver contract must run (possibly
  * to zero rows) against EMPTY tables with the production schemas — a
  * library that throws on an empty partition or a cold-start day is not
  * shippable. Catches ANSI traps (element_at, division), empty-aggregate
  * edge cases, empty-write/read round trips, and empty k-means/LSH inputs. */
class EmptyInputSpec extends SparkTestBase {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("sf-empty").toString
    // events.parquet is TIMESTAMP(NANOS): read raw as long (same loader
    // contract as Tables.events) so the empty fixture keeps the bigint
    // schema the loader expects
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.GraftCatalog.TableNames.foreach { t =>
      val src = spark.read.parquet(s"$sf0001/$t.parquet")
      src.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every contract query runs on empty tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
