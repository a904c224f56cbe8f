package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Plan audits: assert the physical-plan properties the 100 TB design
  * depends on, so a regression in plan shape fails CI, not the cluster.
  * (Filter pushdown / column pruning / broadcast assertions live in
  * RelationalSpec; codegen-span assertion in SortedIntersectSizeSpec.) */
class PlanAuditSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("group-by agg runs partial+final (map-side combine before shuffle)") {
    val p = plan(Relational.aggGroupBy(spark, sf0001))
    // two HashAggregate nodes around one exchange = combiner lifting
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1500))
    assert(p.contains("Exchange"))
  }

  test("global count never shuffles rows, only partial counts") {
    val p = plan(Relational.countGlobal(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).length >= 2)
    // the exchange moves one row per partition (SinglePartition), not data
    assert(p.contains("SinglePartition"), p.take(1500))
  }

  test("dimension-chain join broadcasts all three dims, no shuffle join") {
    val p = plan(Relational.joinMultiway(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length === 3, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("LSH dedup plan contains no nested-loop join (candidates only)") {
    // the uncached build path — minhashDupPairs itself reads the
    // WarehouseCache table back, which would make this audit vacuous
    val p = plan(Dedup.minhashDupPairsDf(
      Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("binned range join plans as a shuffled equi-join, not nested loop") {
    val p = plan(Advanced.binnedRangeJoin(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("wide near-dup banded join plans as SHUFFLE_HASH, never a " +
      "broadcast: the corpus band table hides behind MapPartitions, so " +
      "an unhinted plan auto-broadcasts a multi-million-row side (the " +
      "round-11 driver-collect trap — at 100 TB a driver OOM)") {
    for ((label, df) <- Seq(
      "image_wide" ->
        graft.multimodal.ImageNeardup.imageNeardupWide(spark, sf0001),
      "video_mjpeg" ->
        graft.multimodal.VideoNeardup.videoNeardupPairsMjpeg(spark, sf0001))) {
      val p = plan(df)
      assert(p.contains("ShuffledHashJoin"), s"$label: ${p.take(2000)}")
      assert(!p.contains("BroadcastHashJoin"), s"$label: ${p.take(2000)}")
      assert(!p.contains("NestedLoop"), s"$label: ${p.take(2000)}")
    }
  }

  test("scan of a two-column projection reads only those columns") {
    val p = plan(Relational.scanProject(spark, sf0001))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
      p.take(1500))
  }

  test("documents text-stats scan prunes to the text columns used") {
    val p = plan(TextQueries.textStats(spark, sf0001))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.take(1500))
  }

  test("orderByLimit plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.orderByLimit(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("ANN brute force broadcasts the query side") {
    val p = plan(Similarity.bruteForceTopK(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("minhash signature construction is a pure map — no shuffle, no window, no explode") {
    import org.apache.spark.sql.functions._
    import graft.functions.MinHashExpressions.{minhashSignature, shingleSet}
    import graft.functions.TextAnalysis
    val p = plan(Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), minhashSignature(col("toks")).as("sig"),
        shingleSet(col("toks")).as("sh"))
      .filter(col("sig").isNotNull))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("Generate"), p.take(2000))
  }

  test("ANN top-k plans as partial+final typed aggregate, not a ranking window") {
    val p = plan(Similarity.bruteForceTopK(spark, sf0001))
    assert(!p.contains("Window"), p.take(2000))
    // TypedImperativeAggregate runs in ObjectHashAggregate, partial + final
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("gopher quality is pure per-row projection: zero exchanges") {
    val p = plan(graft.operators.TextQueries.gopherQuality(spark, sf0001))
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("bm25 broadcasts the one-row stats frame, never shuffles the corpus") {
    val p = plan(graft.operators.TextQueries.bm25(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
    // corpus side: no hash-partition exchange of document rows
    assert(!p.contains("Exchange hashpartitioning(doc_id"), p.take(2000))
  }

  test("native as-of join plans exactly two exchanges (one per side)") {
    val df = Relational.asofJoinNative(spark, sf0001)
    df.collect() // finalize AQE
    // AdaptiveSparkPlan's toString prints final AND initial plans — audit
    // the final section only
    val p = plan(df).split("== Initial Plan ==").head
    assert(p.contains("AsOfJoin"), p.take(2000))
    // both sides hash-cluster on the user key; the view-dedup agg adds
    // its own exchange — but nothing shuffles twice on the same key
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length <= 3,
      p.take(3000))
  }

  test("column profile plans no Expand (the multi-distinct trap)") {
    val p = plan(Advanced.columnProfile(spark, sf0001))
    assert(!p.contains("Expand"), p.take(2000))
  }

  test("heavy hitters: candidate join is a broadcast, tokens never shuffle for it") {
    val p = plan(graft.operators.TextQueries.heavyHitters(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
  }

  test("GlobalOrder corpus pass: window partitions by __pid, zero " +
      "single-partition exchanges") {
    // audit the pre-checkpoint production subtree directly — the eager
    // localCheckpoint in runningSums hides it from downstream plans
    val base = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"))
    val p = plan(GlobalOrder.localFrame(base,
      Seq(col("o_totalprice"), col("o_orderkey")),
      Seq("rn" -> org.apache.spark.sql.functions.lit(1L))))
    // the corpus running sum must be a __pid-PARTITIONED window (a
    // regression to a global window would drop this string)
    assert(p.contains("windowspecdefinition(__pid"), p.take(3000))
    // and the corpus itself never collapses into one partition
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
  }

  test("sentiment scoring is join-free: literal-map fold in the scan, " +
      "one rollup exchange") {
    val p = plan(TextQueries.sentimentBySource(spark, sf0001))
    assert(!p.contains("Join"), p.take(2000))
    assert("Exchange".r.findAllIn(p).length <= 2, p.take(2000))
  }

  test("filter-ablation census is a single scan: no join, no explode, " +
      "one rollup exchange") {
    val p = plan(Advanced.filterAblation(spark, sf0001))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Generate"), p.take(2000))
    assert("Exchange".r.findAllIn(p).length <= 2, p.take(2000))
  }

  test("key-skew audit's top-8 plans as partial top-k, never a global sort") {
    val p = plan(Diagnostics.keySkewAudit(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  // Unpartitioned windows of a query, AQE-proof: under adaptive
  // execution `executedPlan` is an AdaptiveSparkPlanExec LEAF, so a
  // naive `.collect { case w: WindowExec ... }` returns Nil for EVERY
  // query and asserts nothing (found vacuous in review; the probe
  // showed root=AdaptiveSparkPlanExec, collected=0, while the plan
  // demonstrably contained unpartitioned windows). Audit the pre-AQE
  // physical plan instead — window shape is decided at planning and
  // AQE never introduces or re-partitions a window.
  private def globalWindows(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    root.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
  }

  test("ranking/CDF family: the only global windows run over the P-row " +
      "offset tables, never the data") {
    val dfs = Seq(
      "q64_shard_pack" -> Advanced.shardPack(spark, sf0001),
      "q122_equidepth_hist" -> Advanced.equidepthHistogram(spark, sf0001),
      "q175_global_rownumber" -> Advanced.globalRowNumber(spark, sf0001),
      "q187_rfm_segments" -> Analytics.rfmSegments(spark, sf0001),
      "q188_quantile_normalize" -> Analytics.quantileNormalize(spark, sf0001),
      "q197_auc" -> Analytics.aucRank(spark, sf0001),
      "q198_ks_test" -> Analytics.ksTest(spark, sf0001),
      // q251/q134/q276 route their corpus/vocabulary ranks through the
      // same GlobalOrder helper — identical contract
      "q251_heaps_law" -> TextQueries.heapsLaw(spark, sf0001),
      "q276_vocab_coverage" -> TextQueries.vocabCoverage(spark, sf0001),
      "q134_prefix_filter_join" ->
        Dedup.prefixFilterJaccardPairs(spark, sf0001))
    val found = dfs.map { case (name, df) => name -> globalWindows(df) }
    // non-vacuousness guard: every one of these uses GlobalOrder, whose
    // ≤P-row offset table is ranked by a global window — the collector
    // must SEE those nodes, or the audit is asserting nothing
    assert(found.count(_._2.nonEmpty) >= dfs.size / 2,
      s"window collector went blind: ${found.map(f => f._1 -> f._2.size)}")
    for ((name, globalWins) <- found; w <- globalWins) {
      // every unpartitioned window must rank the ≤P-row per-__pid offset
      // aggregate, not the data stream
      assert(w.child.toString.contains("__pid"),
        s"$name has a global window over non-offset data:\n" +
          w.toString.take(2000))
    }
  }

  test("zipf fit: vocabulary top-100 is TakeOrderedAndProject; global " +
      "windows rank only the 100-row result") {
    val df = TextQueries.zipfFit(spark, sf0001)
    val p = plan(df)
    // per-partition partial top-k + driver merge, never a global sort
    // or a vocabulary-sized rank window
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    val wins = globalWindows(df)
    // the 100-row rank window must exist AND sit on the top-k result
    assert(wins.nonEmpty, "window collector went blind on zipfFit")
    wins.foreach { w =>
      assert(w.child.toString.contains("TakeOrderedAndProject"),
        "global window not over the top-k result:\n" +
          w.toString.take(2000))
    }
  }

  test("chunk overlap is a join-free scan projection: one Generate, " +
      "zero exchanges") {
    val p = plan(TextQueries.chunkOverlap(spark, sf0001))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("Generate"), p.take(2000))
  }

  test("mixture rebalance: rates broadcast to a map-side join, the " +
      "corpus never sort-merge shuffles") {
    val p = plan(Advanced.mixtureRebalance(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("winnowing is a join-free scan projection: zero joins, zero " +
      "exchanges — rows never interact") {
    val p = plan(TextQueries.winnowing(spark, sf0001))
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("substring dedup: hash-keyed joins only (no pair explosion), " +
      "partial+final dup count, per-doc coverage window stays partitioned") {
    val df = Dedup.substringDedup(spark, sf0001)
    val p = plan(df)
    // candidate structure is occurrence-keyed — a cartesian/nested-loop
    // join here would be the df² pair explosion the design avoids
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the global duplicate detection combines map-side before its shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(3000))
    // coverage lead() runs per doc_id, never as a global window
    assert(globalWindows(df).isEmpty, p.take(3000))
  }

  test("bloom-pruned join probes on the scan side of the exchange and " +
    "stays transparent") {
    val df = Relational.bloomPrunedJoin(spark, sf0001)
    val p = plan(df)
    // the native probe must appear (not a UDF), upstream of any exchange:
    // in the string form the filter prints before its scan, both before
    // the first Exchange that follows the lineitem branch
    assert(p.contains("bloom_might_contain_long"), p.take(3000))
    val probeIdx = p.indexOf("bloom_might_contain_long")
    val lineitemScan = p.indexOf("lineitem.parquet")
    assert(probeIdx >= 0 && lineitemScan > probeIdx,
      "probe is not attached above the fact scan:\n" + p.take(3000))
    // transparency: same result as the plain semi join
    val plain = {
      import org.apache.spark.sql.functions._
      val dim = Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_custkey") % 7 === 0)
        .select(col("o_orderkey"))
      val li = Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
      li.join(dim, li("l_orderkey") === dim("o_orderkey"), "left_semi")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("qty"))
    }
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty)
  }

  test("HOF battery is a pure scan projection: zero exchanges, no Generate") {
    val p = plan(Advanced.hofBattery(spark, sf0001))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(!p.contains("Generate"), p.take(2000))
  }

  test("moments battery runs partial+final in ONE pass (no second scan)") {
    val p = plan(Advanced.momentsBattery(spark, sf0001))
    // one scan of orders: the streaming co-moment recurrences need no
    // mean-first pass (the oracle's two-pass formulation is the contrast)
    assert("orders.parquet".r.findAllIn(p).length === 1, p.take(2000))
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r
      .findAllIn(p).length >= 2, p.take(2000))
  }

  test("BFS round joins broadcast both the frontier and the visited set " +
    "(edges never shuffle)") {
    import org.apache.spark.sql.functions._
    val e = Graph.eventEdges(spark, sf0001)
    val frontier = e.select(col("src").as("node")).limit(5)
    val visited = e.select(col("src").as("node")).limit(20)
    val round = e
      .join(broadcast(frontier.select(col("node").as("f_node"))),
        e("src") === col("f_node"))
      .select(col("dst").as("node")).distinct()
      .join(broadcast(visited), Seq("node"), "left_anti")
    val p = plan(round)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(3000))
    // the edge table reaches its join without any hash-partition exchange
    assert(!p.contains("Exchange hashpartitioning(src"), p.take(3000))
  }

  test("sketch-quantile pass 2 broadcasts the band table, aggregates " +
    "partial+final") {
    // pass 2's shape: base ⋈ broadcast(bands) → grouped agg; audit the
    // equivalent plan directly (sketchQuantiles returns driver-built rows)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val bands = broadcast(Seq(("A", 1.0, 2.0)).toDF("l_returnflag", "lo0", "hi0"))
    val p = plan(base.join(bands, Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("v") < col("lo0"), 1L).otherwise(0L)).as("below0"),
        sort_array(collect_list(
          when(col("v").between(col("lo0"), col("hi0")), col("v"))))
          .as("band0")))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).length >= 2,
      p.take(2000))
  }

  test("bucketed table prunes to ONE bucket for an equality key predicate") {
    import org.apache.spark.sql.functions._
    Advanced.bucketedJoin(spark, sf0001).collect() // ensure tables exist
    val suffix = sf0001.replaceAll("[^a-zA-Z0-9]", "_")
    val key = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).head().getLong(0)
    // autoBucketedScan turns bucketed reading off for join-free queries
    // (it trades pruning for cheaper scans); force it on to audit pruning
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val p = plan(spark.table(s"graft_li_b$suffix")
        .filter(col("l_orderkey") === key))
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined, "no bucket pruning in plan:\n" + p.take(2000))
      assert(m.get.group(1).toInt === 1, p.take(2000))
    } finally spark.conf.set(conf, prev)
  }

  test("day-partitioned sink: a date predicate becomes a PartitionFilter " +
    "(no data read outside the day)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("part_prune").toString
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("ingest_date"))
      .write.mode("overwrite").partitionBy("ingest_date").parquet(dir)
    val someDay = spark.read.parquet(dir)
      .select(col("ingest_date")).head().getDate(0)
    val p = plan(spark.read.parquet(dir)
      .filter(col("ingest_date") === lit(someDay)))
    assert(p.contains("PartitionFilters: ["), p.take(2000))
    assert(p.contains("ingest_date"), p.take(2000))
    // the predicate must NOT appear as a post-scan data filter
    assert(!p.contains("PushedFilters: [IsNotNull(ingest_date"), p.take(2000))
  }

  test("join hints control the physical join (merge vs shuffle_hash)") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val merge = plan(li.join(o.hint("merge"),
      col("l_orderkey") === col("o_orderkey")))
    assert(merge.contains("SortMergeJoin"), merge.take(1500))
    val shj = plan(li.join(o.hint("shuffle_hash"),
      col("l_orderkey") === col("o_orderkey")))
    assert(shj.contains("ShuffledHashJoin"), shj.take(1500))
  }

  test("weighted sample is repeatable and tracks the weight scale") {
    val a = Advanced.weightedSample(spark, sf0001)
    val b = Advanced.weightedSample(spark, sf0001)
    val ra = a.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(ra === b.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet)
    // E[|sample|] = Σp; the md5 draw should land within a loose band
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf0001)
      .select(col("o_totalprice") /
        max(col("o_totalprice")).over() as "p")
    val expected = o.agg(sum("p")).head().getDouble(0)
    assert(math.abs(ra.size - expected) < expected * 0.1,
      s"|sample|=${ra.size}, E=$expected")
  }

  test("TPC-H Q1: shipdate predicate reaches the scan, one agg pass") {
    val p = plan(TpchClassics.q1(spark, sf0001))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      p.take(2000))
    assert("HashAggregate".r.findAllIn(p).length === 2, p.take(2000))
  }

  test("TPC-H Q3: broadcast dim, TakeOrdered for the top 10") {
    val p = plan(TpchClassics.q3(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("TPC-H Q5: dim chain broadcasts; at most one shuffle join") {
    val p = plan(TpchClassics.q5(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p.take(3000))
    assert("SortMergeJoin".r.findAllIn(p).length <= 1, p.take(3000))
  }

  test("multi-distinct aggregation plans ONE Expand, not self-joins") {
    val p = plan(Advanced.multiDistinct(spark, sf0001))
    assert("Expand".r.findAllIn(p).length >= 1, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("geo nearest-supplier: cell join is an EQUI hash join with no " +
      "forced broadcast (the old broadcast(cells) grew with the " +
      "supplier table) and no nested loop") {
    val p = plan(Geo.nearestSupplier(spark, sf0001))
    // equi-join on grid cells, never a nested-loop distance cross join;
    // any broadcast must come from size ESTIMATES (scale-adaptive), not
    // a hint — the supplier side is localCheckpointed (unknown stats),
    // so a hint-free plan shows a shuffle join here
    assert(!p.contains("NestedLoop"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("robust scaling broadcasts the stats, never windows the rows") {
    val p = plan(Advanced.robustScale(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("skip-gram co-occurrence: pair generation is join-free " +
      "(array HOF in the projection, only pair counts shuffle)") {
    val p = plan(TextQueries.skipgramCooc(spark, sf0001))
    assert(!p.contains("Join"), p.take(2000))
    // one Generate (the explode), partial+final agg around one exchange
    assert(p.contains("Generate"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(2000))
  }

  test("grid-DBSCAN: the 9-stencil neighbor match is an equi-join " +
      "(hash), never a nested-loop over cell pairs") {
    val p = plan(Graph.gridDbscan(spark, sf0001))
    assert(!p.contains("NestedLoop"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("item-cosine: both degree attachments broadcast; the only " +
      "shuffles are the incidence distinct and the pair count") {
    val p = plan(Graph.itemCosine(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("rerank ANN: the query set broadcasts in BOTH stages — the " +
      "corpus is never on the build side") {
    val p = plan(Similarity.rerankTopK(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("TPC-H Q6: all three predicates reach the parquet scan as " +
      "pushed filters; one partial+final agg pass") {
    val q6 = TpchClassics.q6(spark, sf0001)
    val scan = q6.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan.take(2000))
    assert(scan.contains("l_shipdate"), scan.take(2000))
    assert("HashAggregate".r.findAllIn(scan).length >= 2, scan.take(2000))
    assert(!scan.contains("Join"), scan.take(2000))
  }

}
