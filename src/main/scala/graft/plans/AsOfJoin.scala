package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native AS-OF join — the full custom-operator chain: logical node →
  * planner strategy → physical operator, registered through
  * `GraftExtensions` (`injectPlannerStrategy`).
  *
  * Semantics (LEFT OUTER as-of): for every left row, attach the right row
  * with the greatest `rightTime <= leftTime` among rows with equal keys;
  * left rows without a match keep null right columns. Rows whose key or
  * time is null never match (SQL equality semantics) but left rows are
  * still emitted. This matches DuckDB's `ASOF LEFT JOIN` — which is also
  * the oracle for the driver-checked query (q74).
  *
  * Physical design (the 100 TB story): both sides hash-cluster on the join
  * keys and sort within partitions by (keys, time) — exactly the
  * distribution/ordering contract a sort-merge join uses, declared via
  * `requiredChildDistribution`/`requiredChildOrdering` so Catalyst's
  * EnsureRequirements plants the exchanges and sorts (and AQE can re-plan
  * them). The operator itself is then a single forward merge pass per
  * partition: O(|L| + |R|) with one buffered right row — no time-range
  * fan-out, no per-key window state beyond a single row, arbitrarily wide
  * partitions stream without materializing.
  *
  * The reference has no joins at all (SURVEY §2: "Joins: none"); this
  * operator belongs to the extension surface (SURVEY §2.3) where event
  * streams are stitched to the latest dimension/state snapshot.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    strict: Boolean = false,
    toleranceUnits: Option[Long] = None)
  extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching non-empty key lists")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy`. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fw, st, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, fw, st, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Per-partition merge pass. Children are co-partitioned on the keys and
  * sorted by (keys, time) — guaranteed by the declared requirements — so a
  * two-pointer walk is complete in both directions:
  *
  *  - BACKWARD (`forward = false`, the default): greatest right time ≤
  *    left time (< when `strict`). When the cursor passes a right row it
  *    is either buffered (eligible, same key) or dead (smaller key) — one
  *    buffered candidate row of state.
  *  - FORWARD (`forward = true`): smallest right time ≥ left time (> when
  *    `strict`). No buffer at all: rows skipped by the cursor (time too
  *    small for the current left row) can never match a LATER left row
  *    (left times are ascending), and the matching head row is NOT
  *    consumed, so it can serve multiple left rows.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    strict: Boolean,
    toleranceUnits: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTimeE = leftTime
    val rTimeE = rightTime
    val fw = forward
    val st = strict
    // tolerance compares raw internal time values (long micros for
    // timestamps, the value itself for integral columns) — resolve the
    // extractor once from the LEFT time type (both sides type-checked
    // equal at construction)
    val tol = toleranceUnits.getOrElse(-1L)
    val timeAsLong: InternalRow => Long = leftTime.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        (r: InternalRow) => r.getLong(0)
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType =>
        (r: InternalRow) => r.getInt(0).toLong
      case other =>
        require(toleranceUnits.isEmpty,
          s"as-of tolerance unsupported for time type ${other.simpleString}")
        (_: InternalRow) => 0L
    }
    val out = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeys, lOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val lTimeProj = UnsafeProjection.create(Seq(lTimeE), lOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTimeE), rOut)
        val keyOrd =
          RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
        val timeOrd =
          RowOrdering.createNaturalAscendingOrdering(Seq(lTimeE.dataType))
        val resultProj = UnsafeProjection.create(out, out)
        val nullRight = new GenericInternalRow(rOut.size)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          // cursor: next unconsumed right row (copied out of the sorter's
          // reused buffer, since it must survive across left rows)
          private var rRow: InternalRow = _
          private var rKey: InternalRow = _
          private var rTime: InternalRow = _
          // buffered candidate: last right row consumed with its key
          private var bufRow: InternalRow = _
          private var bufKey: InternalRow = _
          private var bufTime: Long = 0L
          advanceRight()

          private def advanceRight(): Unit = {
            rRow = null
            while (rRow == null && rIter.hasNext) {
              val r = rIter.next()
              val k = rKeyProj(r)
              val t = rTimeProj(r)
              // null key/time can never match: drop at the cursor
              if (!k.anyNull && !t.anyNull) {
                rRow = r.copy(); rKey = k.copy(); rTime = t.copy()
              }
            }
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            var matched: InternalRow = null
            if (!lKey.anyNull && !lTime.anyNull) {
              if (!fw) {
                // backward: buffer the last eligible row behind the cursor
                val maxCmp = if (st) -1 else 0
                var done = false
                while (!done && rRow != null) {
                  val c = keyOrd.compare(rKey, lKey)
                  if (c < 0) {
                    // dead key: everything buffered for it is dead too
                    bufRow = null; bufKey = null
                    advanceRight()
                  } else if (c == 0 &&
                    timeOrd.compare(rTime, lTime) <= maxCmp) {
                    bufRow = rRow; bufKey = rKey
                    bufTime = timeAsLong(rTime)
                    advanceRight()
                  } else {
                    done = true
                  }
                }
                // the buffer may be left over from an earlier key the
                // right side ran out of rows for — verify it matches
                if (bufRow != null && keyOrd.compare(bufKey, lKey) == 0 &&
                  (tol < 0 || timeAsLong(lTime) - bufTime <= tol)) {
                  matched = bufRow
                }
              } else {
                // forward: skip rows that are too early, match the head
                // without consuming it
                val minCmp = if (st) 1 else 0
                var done = false
                while (!done && rRow != null) {
                  val c = keyOrd.compare(rKey, lKey)
                  if (c < 0 ||
                    (c == 0 && timeOrd.compare(rTime, lTime) < minCmp))
                    advanceRight()
                  else done = true
                }
                if (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                  (tol < 0 || timeAsLong(rTime) - timeAsLong(lTime) <= tol)) {
                  matched = rRow
                }
              }
            }
            numOutputRows += 1
            if (matched != null) numMatched += 1
            joined(l, if (matched != null) matched else nullRight)
            resultProj(joined)
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Analysis-time placeholder behind the SQL surface
  * (`asof_join('left_tbl', 'right_tbl', 'k1,k2', 'lt', 'rt'[, 'forward'
  * [, strict]])`, registered as a table-valued function by
  * `GraftExtensions`): carries the two table subtrees plus column NAMES
  * until the children resolve; the injected [[ResolveAsOfJoin]] analyzer
  * rule then rewrites it into the resolved [[AsOfJoinPlan]]. This is the
  * idiomatic Catalyst unresolved-node + resolution-rule pattern — the SQL
  * path and the DataFrame path converge on the same physical operator. */
case class UnresolvedAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    keys: Seq[String],
    leftTime: String,
    rightTime: String,
    forward: Boolean,
    strict: Boolean,
    rightSuffix: String)
  extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Rewrites [[UnresolvedAsOfJoin]] into [[AsOfJoinPlan]] once both table
  * subtrees are resolved (same fixed-point batch as the built-in
  * resolution rules, injected via `injectResolutionRule`). Right columns
  * come back suffixed, exactly like the DataFrame API. */
class ResolveAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case UnresolvedAsOfJoin(l, r, keys, ltc, rtc, fw, st, sfx)
          if l.resolved && r.resolved =>
        val renamed = Project(r.output.map(a => Alias(a, a.name + sfx)()), r)
        AsOf.resolvedPlan(l, renamed, keys, ltc, rtc, sfx, fw, st)
    }
}

/** DataFrame-level API over the native operator. */
object AsOf {

  /** Resolve key/time column names against already-analyzed children and
    * build the [[AsOfJoinPlan]]; shared by the DataFrame API and the SQL
    * resolution rule. `right` must already carry suffixed column names. */
  private[plans] def resolvedPlan(lPlan: LogicalPlan, rPlan: LogicalPlan,
      keys: Seq[String], leftTimeCol: String, rightTimeCol: String,
      rightSuffix: String, forward: Boolean, strict: Boolean,
      toleranceUnits: Option[Long] = None): AsOfJoinPlan = {
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column `$n` on the $side side " +
          s"(have: ${p.output.map(_.name).mkString(", ")})"))
    val lk = keys.map(attr(lPlan, _, "left"))
    val rk = keys.map(k => attr(rPlan, k + rightSuffix, "right"))
    val lt = attr(lPlan, leftTimeCol, "left")
    val rt = attr(rPlan, rightTimeCol + rightSuffix, "right")
    // this path bypasses the analyzer's join type coercion, and the exec
    // builds its orderings from the LEFT side's types — a mismatched pair
    // would compare raw bytes of different layouts and silently drop or
    // fabricate matches. Refuse instead.
    (lk.zip(rk) :+ (lt, rt)).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of join: column `${l.name}` is ${l.dataType.simpleString} on " +
          s"the left but `${r.name}` is ${r.dataType.simpleString} on the " +
          "right — cast both sides to a common type first")
    }
    AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, forward, strict,
      toleranceUnits)
  }

  /** LEFT OUTER as-of join: for each left row, the nearest right row
    * among equal `keys` — backward (greatest right time ≤ left time, the
    * default) or `forward` (smallest right time ≥ left time); `strict`
    * excludes equal times. Right-side columns come back suffixed
    * (`rightSuffix`), which also makes self-joins safe: the re-alias
    * mints fresh attribute ids. `toleranceUnits` (pandas merge_asof's
    * tolerance) bounds the match distance in the time column's raw units
    * (micros for timestamps): a nearest row further away than the bound
    * null-extends instead of matching.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      rightSuffix: String = "_r", forward: Boolean = false,
      strict: Boolean = false,
      toleranceUnits: Option[Long] = None): DataFrame = {
    require(rightSuffix.nonEmpty, "rightSuffix must be non-empty")
    // works in any session, not just GraftExtensions-built ones: install
    // the planner strategy on first use (idempotent)
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
    val r = right.select(right.columns.map(c =>
      right(c).as(c + rightSuffix)).toSeq: _*)
    val plan = resolvedPlan(left.queryExecution.analyzed,
      r.queryExecution.analyzed, keys, leftTimeCol, rightTimeCol,
      rightSuffix, forward, strict, toleranceUnits)
    GraftSqlBridge.ofRows(left.sparkSession, plan)
  }
}
