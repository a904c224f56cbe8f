package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the PassJoin pigeonhole segment
  * kernel (Li, Deng, Feng, "PASS-JOIN: a partition-based method for
  * similarity joins", VLDB 2011), promoted out of q59's query shape
  * into a reusable (frame, keyCol, strCol, maxDist) → pairs operator
  * (round-9 verdict item 7). Exact: output is identical to the brute
  * force `levenshtein(a, b) <= maxDist` cross join, which is what both
  * the spec and the DuckDB oracles run.
  *
  * Pigeonhole (lossless): split every string of length n into
  * k = maxDist+1 contiguous segments (segment i spans
  * [⌊i·n/k⌋+1, ⌊(i+1)·n/k⌋]). An alignment with ≤ maxDist edits leaves
  * at least one segment UNTOUCHED, and an untouched segment appears
  * VERBATIM in the partner at a start position shifted by at most the
  * number of indels before it (≤ maxDist). So every qualifying pair is
  * found by equi-joining one side's segments against the other side's
  * same-length substrings, keyed (segment, partner length, slot) —
  * the position constraint lives in the KEYED generation (q59's
  * measured lesson: joining on bare segment content and position-
  * filtering AFTER the join let hot segments blow the candidate set,
  * 14× slower than the loop it replaced). Candidates dedup, then
  * rescore with EXACT levenshtein.
  *
  * DEDUP-FIRST (the other q59 lesson): all segment work runs on
  * DISTINCT strings — duplicate strings are pure output structure, and
  * pairing them through the signature join would shuffle |output| wide
  * rows. On distinct strings the candidate volume tracks true fuzzy
  * structure; the key expansion at the end emits exactly the output.
  *
  * Strings shorter than k segments (where an empty segment would void
  * the pigeonhole — "ab"/"xy" at distance 2 share NO substring) pair
  * inside a tiny length-bounded arm: their partners are ≤ k−1+maxDist
  * chars, a character-alphabet-bounded set at any corpus size.
  *
  * Corpus-shape caveat (documented, inherent to PassJoin): a segment
  * string shared VERBATIM at the same slot by a large fraction of the
  * corpus (uniform boilerplate covering a whole segment — e.g.
  * same-length strings that all begin with one constant half) makes
  * the candidate set quadratic in the strings sharing it, because
  * those candidates pass every positional filter and only die in the
  * rescore. Callers own their corpus shape: keys, phones, names, and
  * natural tokens are fine; don't feed template strings whose variable
  * part is confined to one segment. */
object FuzzyJoin {

  /** All key pairs (key_a < key_b) whose strings are within `maxDist`
    * Levenshtein edits, with the exact distance. Output columns:
    * (key_a, key_b, dist) — key columns keep `keyCol`'s type. */
  def editDistancePairs(df: DataFrame, keyCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist + 1 // pigeonhole segment count
    val rows = df.select(col(keyCol).as("key"), col(strCol).as("name"))
      .localCheckpoint() // both sides of the final key expansion
    val p = rows.select(col("name")).distinct()
      .withColumn("n", length(col("name")))
      .localCheckpoint() // segment side + substring side + tiny arm
    // index side: the k segments of each name (all nonempty iff n >= k),
    // keyed by (slot, own length) — the probe side targets exactly this
    val segs = p.filter(col("n") >= k)
      .select(col("name").as("name_a"), col("n").as("l"),
        explode(expr(
          s"""transform(sequence(0, $k - 1), i -> named_struct(
             |  'slot', i,
             |  'sig', substr(name, (i * n) DIV $k + 1,
             |    ((i + 1) * n) DIV $k - (i * n) DIV $k)))""".stripMargin))
          .as("g"))
      .select(col("name_a"), col("l"),
        col("g.slot").as("slot"), col("g.sig").as("sig"))
    // probe side, multi-match-aware: for each partner length l and
    // slot i, substrings of slot i's length at the ≤ 2·maxDist+1
    // positions an untouched segment can occupy (start ± #indels)
    val subs = p
      .select(col("name").as("name_b"),
        explode(expr(
          s"""flatten(flatten(transform(
             |  sequence(greatest(n - $maxDist, $k), n + $maxDist),
             |  l -> transform(sequence(0, $k - 1), i ->
             |    transform(
             |      filter(sequence((i * l) DIV $k + 1 - $maxDist,
             |          (i * l) DIV $k + 1 + $maxDist),
             |        q -> q >= 1 AND
             |          q + ((i + 1) * l) DIV $k - (i * l) DIV $k - 1 <= n),
             |      q -> named_struct('l', l, 'slot', i,
             |        'sig', substr(name, q,
             |          ((i + 1) * l) DIV $k - (i * l) DIV $k)))))))"""
            .stripMargin)).as("g"))
      .select(col("name_b"), col("g.l").as("l"),
        col("g.slot").as("slot"), col("g.sig").as("sig"))
    val candSig = segs.join(subs, Seq("sig", "l", "slot"))
      .filter(col("name_a") =!= col("name_b"))
      .select(col("name_a"), col("name_b"))
    // tiny arm: name pairs where BOTH are shorter than k — the
    // pigeonhole needs k nonempty segments; such a pair's members are
    // < k chars (and any qualifying partner of a sub-k name that is
    // itself >= k chars IS caught by the signature arm via its own
    // segments). Alphabet-bounded at any corpus size.
    val tiny = p.filter(col("n") < k)
    val candTiny = tiny.select(col("name").as("name_a"))
      .crossJoin(tiny.select(col("name").as("name_b")))
      .filter(col("name_a") =!= col("name_b"))
    // exact rescore at DISTINCT-NAME grain, then both orientations plus
    // the diagonal (equal names pair at dist 0 by definition)
    val namePairs = candSig.unionByName(candTiny)
      .select(least(col("name_a"), col("name_b")).as("name_a"),
        greatest(col("name_a"), col("name_b")).as("name_b"))
      .distinct()
      // re-spread before the rescore (round 14): AQE coalesces the
      // byte-small candidate-pair distinct to a few partitions, which
      // would run the CPU-dense exact levenshtein on a few cores;
      // explicit partition counts are exempt from coalescing
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("name_a"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .localCheckpoint() // consumed twice (both orientations)
    val sym = namePairs
      .unionByName(namePairs.select(col("name_b").as("name_a"),
        col("name_a").as("name_b"), col("dist")))
      .unionByName(p.select(col("name").as("name_a"),
        col("name").as("name_b"), lit(0).as("dist")))
    // key expansion: name-keyed joins whose fan-out IS the output size
    rows.select(col("key").as("key_a"), col("name").as("name_a"))
      .join(sym, Seq("name_a"))
      .join(rows.select(col("key").as("key_b"),
        col("name").as("name_b")), Seq("name_b"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("dist"))
  }
}
