package graft

/** The bench regression guard, factored out of [[Bench]] so the firing
  * logic itself is unit-testable (the round-6 verdict found the 2×
  * compare anchored to slow round-1 numbers — q28's first recording was
  * 1.90 s but its best-known is 0.29 s, so the old guard permitted a
  * silent 13× regression from best).
  *
  * Protocol (round 7): the per-query baseline is the MINIMUM across
  * every recorded BASELINE.md row — a best-known ratchet that only ever
  * tightens — with the existing marked-row override: a row whose third
  * cell starts with "re-baselined" RESETS that query's history (a
  * contract change made earlier numbers measure a different
  * computation), so only the marked value and rows recorded AFTER it
  * count. Plain rows can never loosen the ratchet.
  *
  * The firing bound is max(2 × best, best + floorSec): the pure 2×
  * ratio on a best-known minimum is noise-dominated for sub-second
  * queries (a 0.15 s aggregate's bound would be 0.30 s — inside local
  * job-scheduling jitter, and the driver's shared-hardware runs carry
  * a documented ±20%), while for the heavy queries the +floorSec term
  * vanishes relative to 2×. floorSec = 1.0 by default: a genuinely
  * regressed heavy query blows straight past it, a jittered 0.2 s
  * query cannot reach it. */
object BenchGuard {

  // Horizontal whitespace ONLY between cells: `\s*` would cross the
  // newline after a two-cell row and read the NEXT LINE as the third
  // cell — a prose section header beginning "x16 (…)" after an sf0.1
  // table silently tagged that table's last row into the ×16 history
  // (found when the round-7 x16 close flagged q263/q265 against their
  // own sf0.1 numbers). A row's cells must sit on one line.
  private val row =
    """\|[ \t]*(q\d+\w*)[ \t]*\|[ \t]*([0-9.]+)[ \t]*\|[ \t]*([^|\n]*)""".r

  /** Per-query guard baselines parsed from BASELINE.md text.
    *
    * `scaleTag` selects which scale's history a row belongs to: a row
    * whose third cell starts with a scale tag (e.g. "x16") records that
    * scale; untagged rows record the default sf0.1 protocol. The two
    * histories ratchet independently — a fast sf0.1 number must never
    * bound a ×16 run. */
  def baselines(md: String, scaleTag: String = ""): Map[String, Double] =
    row.findAllMatchIn(md).toSeq
      .map { m =>
        val cell3 = m.group(3).trim
        val tag = if (cell3.startsWith("x16")) "x16" else ""
        val note = cell3.stripPrefix(tag).trim
        (m.group(1), m.group(2).toDouble, tag,
          note.startsWith("re-baselined"))
      }
      .filter(_._3 == scaleTag)
      .groupBy(_._1)
      .map { case (q, rows) =>
        // rows arrive in document order = recording order; the LAST
        // re-baseline marker resets history for this query
        val lastReset = rows.lastIndexWhere(_._4)
        val considered = if (lastReset >= 0) rows.drop(lastReset) else rows
        q -> considered.map(_._2).min
      }

  /** Queries whose measured time breaches the guard bound. Skips
    * failed queries (t < 0) and queries with no recorded history. */
  def violations(results: Seq[(String, Double)],
      base: Map[String, Double], floorSec: Double = 1.0): Seq[String] =
    results.collect {
      case (n, t) if t > 0 &&
        base.get(n).exists(b => t > math.max(2 * b, b + floorSec)) => n
    }
}
