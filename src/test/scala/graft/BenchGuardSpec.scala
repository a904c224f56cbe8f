package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench guard must fire on a regression from BEST-KNOWN, not just
  * from the (often slow) first recording — and the re-baseline marker
  * must reset exactly one query's history, exactly once per marker. */
class BenchGuardSpec extends AnyFunSuite {

  private val md =
    """|## v1 numbers
       || query | sec |
       ||---|---|
       || q1_fast | 1.90 |
       || q2_steady | 4.00 |
       || q3_rebased | 0.26 |
       |
       |## v2 numbers
       || q1_fast | 0.29 |
       || q2_steady | 4.20 |
       || q3_rebased | 0.24 |
       |
       |## Re-baselined queries (contract changes)
       || q3_rebased | 0.70 | re-baselined round 6: check form added |
       |
       |## v3 numbers
       || q1_fast | 0.35 |
       || q3_rebased | 0.68 |
       |""".stripMargin

  test("baseline is the minimum across all recorded rounds") {
    val b = BenchGuard.baselines(md)
    assert(b("q1_fast") === 0.29)
    assert(b("q2_steady") === 4.00)
  }

  test("a re-baseline marker resets history: earlier (faster) rows are " +
      "ignored, later plain rows can still tighten") {
    val b = BenchGuard.baselines(md)
    // 0.26/0.24 predate the contract change; 0.68 was recorded after
    // the marker and ratchets below the marked 0.70
    assert(b("q3_rebased") === 0.68)
  }

  test("guard fires on a 2.5x-of-best slowdown of a heavy query") {
    val b = BenchGuard.baselines(md)
    // q2's best is 4.00 s; 10.0 s = 2.5x of best must fire even though
    // it is under 2.5x of ANY single recorded row + noise floor
    val v = BenchGuard.violations(Seq("q2_steady" -> 10.0), b)
    assert(v === Seq("q2_steady"))
  }

  test("the old first-recorded anchor's blind spot is closed: a query " +
      "whose first recording was slow cannot silently regress to it") {
    val b = BenchGuard.baselines(md)
    // 1.80 s is UNDER 2x the 1.90 first recording (old guard: silent)
    // but 6x best-known 0.29 + over the noise floor → must fire
    val v = BenchGuard.violations(Seq("q1_fast" -> 1.80), b)
    assert(v === Seq("q1_fast"))
  }

  test("the noise floor absorbs jitter on sub-second queries") {
    val b = BenchGuard.baselines(md)
    // 2x of a 0.29 best is 0.58 — inside local job jitter; the +1 s
    // floor keeps 0.9 s quiet while the previous test's 1.80 s fires
    assert(BenchGuard.violations(Seq("q1_fast" -> 0.9), b).isEmpty)
  }

  test("failed queries (-1) and unknown queries never fire") {
    val b = BenchGuard.baselines(md)
    assert(BenchGuard.violations(
      Seq("q1_fast" -> -1.0, "q99_new" -> 50.0), b).isEmpty)
  }

  test("scale-tagged rows form an independent history: an sf0.1 best " +
      "never bounds a x16 run, and vice versa") {
    val md2 = md +
      """|
         |## x16 numbers
         || q1_fast | 4.50 | x16 |
         || q2_steady | 40.0 | x16 |
         |""".stripMargin
    val b16 = BenchGuard.baselines(md2, "x16")
    assert(b16 === Map("q1_fast" -> 4.5, "q2_steady" -> 40.0))
    // default-scale history unchanged by the tagged rows
    assert(BenchGuard.baselines(md2)("q1_fast") === 0.29)
    // 6 s at x16 is fine against 4.5 best; it would have fired against
    // the 0.29 sf0.1 best — the histories must not cross
    assert(BenchGuard.violations(Seq("q1_fast" -> 6.0), b16).isEmpty)
    assert(BenchGuard.violations(Seq("q1_fast" -> 10.0), b16)
      === Seq("q1_fast"))
  }

  test("a prose line after a table cannot become a row's third cell: " +
      "an 'x16 (...)' section header must not tag the preceding " +
      "sf0.1 row into the x16 history") {
    // exactly the BASELINE.md shape that mis-tagged q263/q265 in the
    // round-7 x16 close: a two-cell sf0.1 row, a blank line, then a
    // prose header beginning with "x16"
    val md3 =
      """|| q7_mixed | 2.37 |
         |
         |x16 (16 g heap, /tmp/x16):
         |
         || q7_mixed | 14.36 | x16 |
         |""".stripMargin
    assert(BenchGuard.baselines(md3) === Map("q7_mixed" -> 2.37))
    assert(BenchGuard.baselines(md3, "x16") === Map("q7_mixed" -> 14.36))
    // 13.6 s at x16 is BELOW the x16 best — must not fire (it did,
    // against the bled-through 2.37, before the same-line fix)
    assert(BenchGuard.violations(Seq("q7_mixed" -> 13.6),
      BenchGuard.baselines(md3, "x16")).isEmpty)
  }

  test("a scale tag is a WHOLE token: a note merely beginning with " +
      "'x16' (or a future x160 tag) stays in the default history") {
    val md4 =
      """|| q8_noted | 3.00 | x16-adjacent prose note |
         || q8_noted | 5.00 | x160 future tag |
         || q8_noted | 7.00 | x16 |
         |""".stripMargin
    assert(BenchGuard.baselines(md4) === Map("q8_noted" -> 3.0))
    assert(BenchGuard.baselines(md4, "x16") === Map("q8_noted" -> 7.0))
  }

  test("output-normalized ratchet: output growth at the same rate " +
      "never fires, a plan regression at the same output does") {
    val md5 = "| q9_pairs | 10.00 | rows=1000000 |\n" +
      "| q2_steady | 4.00 |\n"
    val base = BenchGuard.baselines(md5)
    val rate = BenchGuard.rateBaselines(md5)
    assert(rate === Map("q9_pairs" -> 1e-5))
    assert(base("q9_pairs") === 10.0) // wall history still parses
    // 4× output, 4× time — same sec/row. The wall-time bound (20 s)
    // would have fired; the rate bound must not.
    assert(BenchGuard.violationsWithRows(
      Seq(("q9_pairs", 40.0, 4000000L)), base, rate).isEmpty)
    // same output, 2.5× time: plan regression — fires
    assert(BenchGuard.violationsWithRows(
      Seq(("q9_pairs", 25.0, 1000000L)), base, rate) === Seq("q9_pairs"))
    // rows-free queries keep the wall-time rule through the same call
    assert(BenchGuard.violationsWithRows(
      Seq(("q2_steady", 10.0, 5L)), base, rate) === Seq("q2_steady"))
    // a zero-row run can't be rate-bounded: falls back to wall time
    assert(BenchGuard.violationsWithRows(
      Seq(("q9_pairs", 15.0, 0L)), base, rate).isEmpty)
    assert(BenchGuard.violationsWithRows(
      Seq(("q9_pairs", 25.0, 0L)), base, rate) === Seq("q9_pairs"))
  }

  test("rate history ratchets to the best sec/row, respects resets, " +
      "and combines with scale tags") {
    val md6 =
      """|| q9_pairs | 10.00 | rows=1000000 |
         || q9_pairs | 4.00 | rows=1000000 |
         || q9_pairs | 20.00 | x16 rows=10000000 |
         |""".stripMargin
    assert(BenchGuard.rateBaselines(md6) === Map("q9_pairs" -> 4e-6))
    assert(BenchGuard.rateBaselines(md6, "x16") === Map("q9_pairs" -> 2e-6))
    val md7 =
      """|| q9_pairs | 4.00 | rows=1000000 |
         || q9_pairs | 12.00 | re-baselined round 8: rows=1000000 |
         |""".stripMargin
    assert(BenchGuard.rateBaselines(md7) === Map("q9_pairs" -> 1.2e-5))
  }

  test("boundFor: rate bound when rows-annotated history exists and " +
      "the run produced rows, wall bound otherwise, None with no " +
      "history — the same bound the contention retry re-tests") {
    val base = Map("q1" -> 1.0)
    val rate = Map("q1" -> 2e-6)
    // rate path: max(2·2e-6·1e6, 2e-6·1e6 + 1) = max(4, 3) = 4
    assert(BenchGuard.boundFor("q1", 1000000L, base, rate) === Some(4.0))
    // zero rows → falls back to the wall bound max(2·1, 1+1) = 2
    assert(BenchGuard.boundFor("q1", 0L, base, rate) === Some(2.0))
    // no history of either kind → never fires
    assert(BenchGuard.boundFor("q2", 10L, base, rate) === None)
  }

  // ---------------------------------------------- MiniBench adjudication

  private val miniMd =
    """|## Round-8 MiniBench run 1
       |
       |```
       |q112_opq | 99.0 | not a mini line (table rows never parse here) |
       |q112_opq: 1.018 s
       |q84_pq: 0.782 s
       |```
       |
       |## Round-8 MiniBench run 2
       |
       |```
       |q112_opq: 1.186 s
       |q84_pq: 2.9 s
       |```
       |""".stripMargin

  test("miniHistory parses only `name: X s` lines, in document order") {
    val h = BenchGuard.miniHistory(miniMd)
    assert(h("q112_opq") === Seq(1.018, 1.186))
    assert(h("q84_pq") === Seq(0.782, 2.9))
  }

  test("adjudication downgrades a flag whose last MiniBench value is " +
      "at best-known (contention), confirms one whose isolated run " +
      "also regressed, and confirms queries with no MiniBench history") {
    val mini = BenchGuard.miniHistory(miniMd)
    // q112: last 1.186 <= max(2*1.018, 1.018+1) → adjudicated (the
    // round-8 dangling-flag case, closed)
    // q84: last 2.9 > max(2*0.782, 1.782) → the isolated protocol
    // corroborates the regression → confirmed
    // q999: no MiniBench history → confirmed as-is
    val (confirmed, adjudicated) = BenchGuard.adjudicate(
      Seq("q112_opq", "q84_pq", "q999_none"), mini)
    assert(adjudicated === Seq("q112_opq"))
    assert(confirmed === Seq("q84_pq", "q999_none"))
  }

  test("adjudication never loosens the MiniBench ratchet: the bound is " +
      "the MINIMUM across all recorded runs, not the latest") {
    // latest run slowed to 2.2 s; min is 1.0 → bound max(2.0, 2.0) →
    // 2.2 exceeds it and the flag stays confirmed even though 2.2 is
    // within 2x of the LATEST recorded value (2.2 <= 4.4)
    val mini = Map("q5_x" -> Seq(1.0, 2.2))
    val (confirmed, adjudicated) =
      BenchGuard.adjudicate(Seq("q5_x"), mini)
    assert(confirmed === Seq("q5_x") && adjudicated.isEmpty)
  }

  test("mini parsing is anchored to MiniBench sections: a same-shaped " +
      "line in prose or another section never enters history") {
    val md =
      """|## Round-9 sf0.1 close
         |
         |q112_opq: 9.9 s was the in-sequence number (prose, not a record)
         |
         |```
         |q300_other: 1.0 s
         |```
         |
         |## Round-9 MiniBench run 1
         |
         |code: abc123def456
         |```
         |q112_opq: 1.018 s
         |```
         |""".stripMargin
    val h = BenchGuard.miniHistory(md)
    assert(h === Map("q112_opq" -> Seq(1.018)),
      "only the MiniBench section's lines parse")
    val blocks = BenchGuard.miniBlocks(md)
    assert(blocks.size === 1 && blocks.head.stamp === Some("abc123def456"))
  }

  test("stamped adjudication: a current-code stamp adjudicates, a stale " +
      "or missing stamp stays confirmed — a regression introduced after " +
      "the last recorded run can never be cleared by old evidence") {
    def md(stamp: String) =
      s"""|## MiniBench run
          |code: $stamp
          |```
          |q112_opq: 1.018 s
          |```
          |""".stripMargin
    val cur = Some("cafe01cafe01")
    // current stamp + value at best-known → adjudicated
    val (c1, a1) = BenchGuard.adjudicateStamped(Seq("q112_opq"),
      BenchGuard.miniBlocks(md("cafe01cafe01")), cur)
    assert(a1 === Seq("q112_opq") && c1.isEmpty)
    // stale stamp → confirmed, regardless of the recorded value
    val (c2, a2) = BenchGuard.adjudicateStamped(Seq("q112_opq"),
      BenchGuard.miniBlocks(md("0dd0dd0dd0dd")), cur)
    assert(c2 === Seq("q112_opq") && a2.isEmpty)
    // unstamped legacy block → confirmed
    val legacy = "## MiniBench run\n```\nq112_opq: 1.018 s\n```\n"
    val (c3, a3) = BenchGuard.adjudicateStamped(Seq("q112_opq"),
      BenchGuard.miniBlocks(legacy), cur)
    assert(c3 === Seq("q112_opq") && a3.isEmpty)
    // unknown current stamp (sources unreadable) → refuse everything
    val (c4, a4) = BenchGuard.adjudicateStamped(Seq("q112_opq"),
      BenchGuard.miniBlocks(md("cafe01cafe01")), None)
    assert(c4 === Seq("q112_opq") && a4.isEmpty)
  }

  test("stamped adjudication uses the stamp of the LAST block recording " +
      "the query and still ratchets on the minimum across all blocks") {
    val md =
      """|## MiniBench run 1
         |code: aaaaaaaaaaaa
         |```
         |q5_x: 1.0 s
         |```
         |## MiniBench run 2
         |code: cafe01cafe01
         |```
         |q5_x: 2.2 s
         |```
         |""".stripMargin
    // last block is current-code, but 2.2 > max(2×1.0, 2.0) → confirmed
    val (c, a) = BenchGuard.adjudicateStamped(Seq("q5_x"),
      BenchGuard.miniBlocks(md), Some("cafe01cafe01"))
    assert(c === Seq("q5_x") && a.isEmpty)
  }

  test("codeStamp digests main sources deterministically and is None " +
      "outside a source tree") {
    val s1 = BenchGuard.codeStamp()
    val s2 = BenchGuard.codeStamp()
    assert(s1.isDefined && s1 === s2)
    assert(BenchGuard.codeStamp("/no/such/dir").isEmpty)
  }

  test("boxIndex is the median ratio to best-known: uniform slowdown " +
      "reads as the box, outlier regressions don't move it") {
    val best = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 4.0, "q4" -> 0.5,
      "q5" -> 3.0)
    // a uniformly 1.6× slower box → index 1.6 exactly
    val uniform = best.toSeq.map { case (n, b) => (n, b * 1.6) }
    assert(math.abs(BenchGuard.boxIndex(uniform, best).get - 1.6) < 1e-9)
    // one 10× regression on a quiet box → median stays ~1, not 10
    val oneBad = Seq(("q1", 1.0), ("q2", 2.1), ("q3", 40.0), ("q4", 0.5),
      ("q5", 2.9))
    assert(BenchGuard.boxIndex(oneBad, best).get < 1.1)
    // failed queries (t<0) and no-history queries are excluded; all
    // excluded → None
    assert(BenchGuard.boxIndex(Seq(("q1", -1.0), ("qX", 5.0)), best).isEmpty)
  }

  test("boxIndex is the TRUE median on even-sized panels: the two " +
      "middle ratios average instead of biasing upward (round-11 advice)") {
    val best = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0, "q4" -> 1.0)
    // ratios 1.0, 1.2, 1.8, 3.0 → median (1.2 + 1.8)/2 = 1.5, not 1.8
    val run = Seq(("q1", 1.0), ("q2", 1.2), ("q3", 1.8), ("q4", 3.0))
    assert(math.abs(BenchGuard.boxIndex(run, best).get - 1.5) < 1e-9)
    // odd panels keep the middle element exactly
    assert(math.abs(BenchGuard.boxIndex(run.take(3), best).get - 1.2) < 1e-9)
  }

  test("flagsJson names the flags verbatim within budget and folds the " +
      "overflow into '+N more' so the one-line artifact stays bounded") {
    assert(BenchGuard.flagsJson(Seq.empty) === "[]")
    assert(BenchGuard.flagsJson(Seq("q110_recursive_chain", "q278_x")) ===
      """["q110_recursive_chain","q278_x"]""")
    // a pathology run's 70 flags must not blow the driver's 2000-char
    // stdout tail: emit until the budget, fold the rest
    val many = (1 to 70).map(i => f"q$i%03d_some_query_name")
    val js = BenchGuard.flagsJson(many, budget = 60)
    assert(js.length <= 60 + 16, js) // the fold marker rides past budget
    assert(js.startsWith("""["q001_some_query_name"""))
    assert(js.endsWith("""more"]"""))
    val kept = "\"q\\d+_some_query_name\"".r.findAllIn(js).size
    assert("\\+(\\d+) more".r.findFirstMatchIn(js).get.group(1).toInt ===
      70 - kept)
  }

  test("flagsJson JSON-escapes quotes and backslashes in names so one " +
      "pathological flag cannot corrupt the one-line artifact (r12 advice)") {
    assert(BenchGuard.flagsJson(Seq("""q1_has"quote""", """q2_has\slash""")) ===
      """["q1_has\"quote","q2_has\\slash"]""")
  }

  test("adjudicateIsolated clears a flag only when the 3-trial isolated " +
      "minimum sits within the query's own ratchet bound (round 13: the " +
      "in-run form of the MiniBench protocol, so non-panel flags no " +
      "longer dangle a full round)") {
    val bounds = Map("q_contention" -> 2.0, "q_regressed" -> 2.0)
    val mins = Map(
      "q_contention" -> 1.4, // isolated at best-known → contention
      "q_regressed" -> 3.1, // still over in isolation → a real flag
      "q_failed" -> -1.0) // a failed trial must never clear
    val (confirmed, cleared) = BenchGuard.adjudicateIsolated(
      Seq("q_contention", "q_regressed", "q_failed"),
      bounds.get, mins)
    assert(confirmed === Seq("q_regressed", "q_failed"))
    assert(cleared === Seq("q_contention" -> 1.4))
    // exactly at the bound clears (the bound is inclusive, matching
    // Bench's retry compare); no recorded bound never clears
    val (c2, a2) = BenchGuard.adjudicateIsolated(
      Seq("q_at_bound", "q_no_history"),
      Map("q_at_bound" -> 2.0).get, Map("q_at_bound" -> 2.0,
        "q_no_history" -> 0.1))
    assert(c2 === Seq("q_no_history") && a2 === Seq("q_at_bound" -> 2.0))
  }

  test("adjudicateIsolatedEarly short-circuits after the first clearing " +
      "trial (round-14, verdict item 7: the min of k trials only " +
      "improves with more trials, so later trials cannot un-clear), " +
      "poisons on a failed trial, and matches adjudicateIsolated's " +
      "verdicts otherwise") {
    val calls = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    // q_fast clears on trial 1; q_slow_then_ok clears on trial 2;
    // q_regressed never clears (3 trials); q_fails poisons on trial 1
    val seqs = Map(
      "q_fast" -> Seq(1.5),
      "q_slow_then_ok" -> Seq(2.5, 1.9),
      "q_regressed" -> Seq(3.0, 3.2, 3.1),
      "q_fails" -> Seq(-1.0, 0.5, 0.5))
    def trial(n: String): Double = {
      val i = calls(n); calls(n) = i + 1; seqs(n)(i)
    }
    val bound = Map("q_fast" -> 2.0, "q_slow_then_ok" -> 2.0,
      "q_regressed" -> 2.0, "q_fails" -> 2.0)
    val (confirmed, cleared) = BenchGuard.adjudicateIsolatedEarly(
      Seq("q_fast", "q_slow_then_ok", "q_regressed", "q_fails"),
      bound.get, trial)
    assert(confirmed === Seq("q_regressed", "q_fails"))
    assert(cleared === Seq("q_fast" -> 1.5, "q_slow_then_ok" -> 1.9))
    // the short-circuit itself: one trial for the immediate clear, two
    // for the second-trial clear, the full three only for a confirmed
    // flag, and exactly one for the poisoned query (never a fake clear
    // from trials after a failure)
    assert(calls("q_fast") === 1)
    assert(calls("q_slow_then_ok") === 2)
    assert(calls("q_regressed") === 3)
    assert(calls("q_fails") === 1)
  }

  test("every declared query resolves to a guard bound at the sf0.1 " +
      "protocol — a query can never enter the contract unridden by the " +
      "ratchet (round-14, verdict item 1: q294's 15.28 s rode the " +
      "round-13 bench unflagged because q293–q296 had MiniBench blocks " +
      "but no | qNNN | sec | table row)") {
    val md = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BASELINE.md"))
    val base = BenchGuard.baselines(md)
    val rateBase = BenchGuard.rateBaselines(md)
    val unguarded = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      // rows = 1: any positive count exercises the rate-bound arm for
      // rate-annotated queries and the wall arm for the rest
      BenchGuard.boundFor(n, 1L, base, rateBase).isEmpty
    }
    assert(unguarded.isEmpty,
      s"queries with no BASELINE.md guard row: $unguarded")
  }
}
