package graft.operators

import graft.SparkTestBase

/** Round-7 hot-key safety: the two pair joins the round-6 verdict marked
  * weak-at-100× now carry enforced bounds — q231's weighted-Jaccard
  * postings join prunes hot tokens losslessly (AllPairs prefix filter),
  * q232's item-cosine caps per-user incidence before pairing. These specs
  * pin BOTH halves of each contract: the bound actually engages on a
  * planted hot key, and the output stays exact (q231) / follows the
  * documented capped estimator (q232). */
class HotKeySpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  /** 40 docs, each "hot hot" + 20 unique body tokens; docs 0/1 and 2/3
    * are near-dups (bodies overlap heavily); every other pair shares
    * ONLY the hot token. */
  private def plantedCorpus(): Seq[(Long, String)] = {
    def body(i: Long): Seq[String] =
      (0 until 20).map(j => s"w${i}_$j")
    val base = (0L until 40L).map { i =>
      val b = i match {
        // near-dup pairs: 1 shares 17 of 0's tokens, 3 shares 16 of 2's
        case 1L => body(0).take(17) ++ (0 until 3).map(j => s"x1_$j")
        case 3L => body(2).take(16) ++ (0 until 4).map(j => s"x3_$j")
        case _ => body(i)
      }
      (i, ("hot hot " + b.mkString(" ")))
    }
    base
  }

  test("q231 prefix filter: a corpus-wide hot token is excluded from " +
      "the inverted index for every ordinary doc, but kept for a doc " +
      "that is MOSTLY that token") {
    // hot mass 2 of T=22 → 2/22 < 3/13·... strictly under β·T → excluded
    val docs = (plantedCorpus() :+
      // doc 100: 20× hot + 1 rare → hot tail mass 20/21 ≥ β·T → indexed
      (100L, (Seq.fill(20)("hot") :+ "rareonly").mkString(" ")))
      .toDF("doc_id", "text")
    val idx = TextQueries.wjIndex(TextQueries.wjTf(docs), 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ordinary = (0L until 40L)
    assert(ordinary.forall(i => !idx.contains((i, "hot"))),
      "hot token leaked into an ordinary doc's index entries")
    assert(idx.contains((100L, "hot")),
      "mostly-hot doc must still index the hot token (it IS the doc)")
    // rare body tokens stay indexed (the discriminative prefix)
    assert(idx.contains((0L, "w0_0")))
  }

  test("q231 prefix-filtered pairs equal the naive brute force, " +
      "including a pair at exactly the threshold") {
    // boundary pair: 13 tokens each, 6 shared → jw = 6/20 = 0.3 exactly
    val boundary = Seq(
      (200L, ((1 to 6).map(j => s"s$j") ++ (1 to 7).map(j => s"a$j"))
        .mkString(" ")),
      (201L, ((1 to 6).map(j => s"s$j") ++ (1 to 7).map(j => s"b$j"))
        .mkString(" ")))
    val docs = (plantedCorpus() ++ boundary).toDF("doc_id", "text")
    val got = TextQueries.weightedJaccardPairsDf(docs, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // brute force on the same tokenization + same rounding
    val tfs = (plantedCorpus() ++ boundary).map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).map(_.toLowerCase)
        .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    }.toMap
    val ids = tfs.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = tfs(ids(i)); b = tfs(ids(j))
      smin = a.keysIterator.filter(b.contains)
        .map(k => math.min(a(k), b(k))).sum
      ta = a.values.sum; tb = b.values.sum
      jw = math.rint(smin.toDouble / (ta + tb - smin) * 1e6) / 1e6
      if jw >= 0.3
    } yield (ids(i), ids(j)) -> jw).toMap
    assert(got === want,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    assert(want.contains((200L, 201L)) && want((200L, 201L)) === 0.3,
      "the crafted boundary pair must sit exactly at the threshold")
  }

  test("q232 item-cosine: the per-user cap keeps only the M most " +
      "recent items and the whole build sees NOTHING past the cap") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // power user -1: items 0..9, recency = item id (9 most recent);
    // organic users 1..4 co-engage items {7, 8, 0} (exactly at the
    // cap) — item 0 must stay alive via the ORGANIC users even though
    // the power user's copy of it is dropped
    val power = (0 until 10).map(i => (-1L, i, ts(i.toLong)))
    val organic = (1L to 4L).flatMap(u =>
      Seq((u, 7, ts(100)), (u, 8, ts(100)), (u, 0, ts(100))))
    val inter = (power ++ organic).toDF("u", "item", "ts")
    val got = Graph.itemCosineDf(inter, k = 5, maxPerUser = 3)
      .select("i", "j", "c").as[(Int, Int, Long)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    // capped incidence: power user keeps {9, 8, 7}; organic keep all 3
    // → co-engagement (7,8) = 4 organic + 1 power = 5; (0,7) and
    // (0,8) = 4 organic only; (8,9) and (7,9) = power only = 1
    assert(got((7, 8)) === 5L, s"got=$got")
    assert(got((0, 7)) === 4L && got((0, 8)) === 4L)
    assert(got((8, 9)) === 1L && got((7, 9)) === 1L)
    // items 1..6 exist ONLY in the power user's dropped tail → they
    // must not appear anywhere in the output
    val itemsSeen = got.keysIterator.flatMap(p => Seq(p._1, p._2)).toSet
    assert((1 to 6).forall(i => !itemsSeen.contains(i)),
      s"capped-away items leaked: $itemsSeen")
  }

  test("q232 cap estimator consistency: degrees come from the capped " +
      "incidence, so sim never exceeds 1") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val inter = ((0 until 50).map(i => (-1L, i, ts(i.toLong))) ++
      Seq((2L, 48, ts(1)), (2L, 49, ts(1))))
      .toDF("u", "item", "ts")
    val bad = Graph.itemCosineDf(inter, k = 5, maxPerUser = 5)
      .filter(col("sim") > 1.0 + 1e-9).count()
    assert(bad === 0L)
  }
}
