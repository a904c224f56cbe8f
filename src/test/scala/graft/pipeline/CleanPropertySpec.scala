package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkTestBase

/** ScalaCheck properties of the cleaning chain (SURVEY §5): idempotence,
  * the partition law of the split, and the T1 single-colon contract —
  * checked on generated rows, not just the fixture. */
object CleanPropertySpec extends Properties("Clean") {
  private lazy val spark = SparkTestBase.session
  import Prop.{forAllNoShrink => forAll}

  private val fieldGen: Gen[String] = for {
    base <- Gen.alphaNumStr.map(_.take(8))
    junk <- Gen.listOf(Gen.oneOf('?', '%', '&', ' ', ':')).map(_.mkString)
  } yield base + junk

  private val rowGen: Gen[Seq[String]] = Gen.listOfN(11, fieldGen)

  private def toDf(rows: Seq[Seq[String]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 2),
      FoodSchema.raw)

  // NOTE deliberately NOT claimed: full-chain idempotence. T1 strips exactly
  // one trailing colon per application (reference `code/beam.py:37-38`), so
  // "items::" cleans to "items:" and a second pass strips again — the
  // reference's semantics are one-shot, and ScalaCheck falsified the naive
  // idempotence property immediately. T2/T3 are genuinely idempotent:
  property("lowercase+specialchar steps are idempotent") =
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val once = Clean(toDf(rows.take(6)))
      val twice = Clean.removeSpecialCharacters(Clean.lowercaseAll(once))
      once.exceptAll(
        twice.select(FoodSchema.outputColumns.map(col): _*)).count() == 0
    }

  property("split partitions the cleaned rows") =
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val cleaned = Clean(toDf(rows.take(8)))
      val (del, oth) = Split.byStatus(cleaned)
      del.count() + oth.count() == cleaned.count()
    }

  property("no ?%& or uppercase survives") =
    forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      !Clean(toDf(rows.take(6))).collect().flatMap(_.toSeq).exists {
        case s: String => s.exists(c => "?%&".contains(c) || c.isUpper)
        case _ => false
      }
    }

  property("items loses exactly one trailing colon") =
    forAll(Gen.alphaLowerStr.map(_.take(6)), Gen.choose(0, 3)) {
      (base, colons) =>
        val items = base + (":" * colons)
        val row = Seq("c1", "1/1/2024", "1.2.3", "o1", items, "10", "card",
          "r1", "Delivered", "5", "ok")
        val out = Clean(toDf(Seq(row))).select("items").head().getString(0)
        val expected = if (colons > 0) base + (":" * (colons - 1)) else base
        out == expected
    }
}
