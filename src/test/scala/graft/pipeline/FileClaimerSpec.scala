package graft.pipeline

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** File-claim semantics: first match only, move to processed/, raise when
  * empty (reference `code/airflow_pipe.py:44-57`). */
class FileClaimerSpec extends AnyFunSuite {
  private val conf = new Configuration()

  private def mkDir(): Path = Files.createTempDirectory("claimer")

  test("claims the first (lexicographic) matching file and moves it") {
    val dir = mkDir()
    Files.writeString(dir.resolve("food_daily_b.csv"), "b")
    Files.writeString(dir.resolve("food_daily_a.csv"), "a")
    Files.writeString(dir.resolve("unrelated.txt"), "x")
    val claimed = FileClaimer.claimFirst(conf, dir.toString, "food_daily")
    assert(claimed.getName === "food_daily_a.csv")
    assert(claimed.getParent.getName === "processed")
    assert(!Files.exists(dir.resolve("food_daily_a.csv")))
    assert(Files.exists(dir.resolve("processed/food_daily_a.csv")))
    // second claim takes the next file
    val second = FileClaimer.claimFirst(conf, dir.toString, "food_daily")
    assert(second.getName === "food_daily_b.csv")
  }

  test("raises when no file matches") {
    val dir = mkDir()
    Files.writeString(dir.resolve("other.csv"), "x")
    intercept[FileClaimer.NoFileFound] {
      FileClaimer.claimFirst(conf, dir.toString, "food_daily")
    }
  }

  test("senses presence of unclaimed matches") {
    val dir = mkDir()
    assert(!FileClaimer.senses(conf, dir.toString, "food_daily"))
    Files.writeString(dir.resolve("food_daily_1.csv"), "x")
    assert(FileClaimer.senses(conf, dir.toString, "food_daily"))
  }
}
