package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorFunctions
import graft.operators.Tables

/** Synthetic scale-up probes: replicate the sf inputs in-plan ×N (perturbed
  * ids, perturbed text so replicas aren't trivial duplicates) and time the
  * engine's heavy paths — checking for NONLINEAR cliffs (spill, state
  * blowup, skew collapse), not absolute speed. This is the committed,
  * reproducible form of the scale evidence in BASELINE.md: local[32] can't
  * demonstrate 1000 executors, but it can demonstrate that cost grows
  * linearly in input size with plans whose shuffle structure is
  * scale-independent.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ScaleProbe [factors|probe-prefixes...]
  * — numeric args are replication factors (default: 16 64), non-numeric
  * args filter probes by name prefix (default: all). Prints one JSON line.
  */
object ScaleProbe {

  /** Probe-name prefixes selected by the CLI (None = all). */
  private var only: Option[Seq[String]] = None
  private def want(p: String): Boolean =
    only.forall(_.exists(p.startsWith))

  /** Replicate a docs frame ×n with unique ids and perturbed text (replica
    * tag appended → shingle/token sets differ, so dedup probes measure the
    * real mostly-unique-corpus workload, not n-way duplicate clusters). */
  def replicateDocs(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), lit(n - 1L))).as("rep"))
      .select((col("doc_id") * n + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))

  /** Replicate ×n with per-replica DISJOINT token namespaces (every token
    * suffixed _r<rep>): replicas share no vocabulary, so similarity-join
    * probes see a mostly-unique corpus whose true pair count grows
    * LINEARLY — [[replicateDocs]]'s one-token tag keeps replicas of one
    * doc near-identical to each other, which makes any exact similarity
    * join's OUTPUT quadratic in n and says nothing about the algorithm. */
  def replicateDocsDisjoint(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), lit(n - 1L))).as("rep"))
      .select((col("doc_id") * n + col("rep")).as("doc_id"),
        expr("concat_ws(' ', transform(filter(split(text, ' '), w -> w != ''), " +
          "w -> concat(w, '_r', rep)))").as("text"))

  def replicateKeyed(df: DataFrame, key: String, n: Int): DataFrame =
    df.withColumn("rep", explode(sequence(lit(0L), lit(n - 1L))))
      .withColumn(key, col(key) * n + col("rep"))
      .drop("rep")

  /** Pre-timer cleanup hook, set once the session exists: drops every
    * leftover localCheckpoint block (blocking) and GCs, OUTSIDE the
    * timed region — Bench has done this since round 4 (dead pinned
    * blocks accumulate into storage-memory pressure that slowed its
    * tail ~5×), and the round-10 mega-cluster probe series showed the
    * same contamination here: back-to-back checkpoint-heavy probes in
    * one JVM measured 2-8× apart run-to-run until the blocks were
    * dropped. */
  private var preTimer: () => Unit = () => ()

  /** INVARIANT: every probe must BUILD its frames inside its own time{}
    * block — preTimer unpersists every persistent RDD before the timed
    * region, and a localCheckpoint materialized outside the block is
    * UNRECOVERABLE once dropped (truncated lineage): a probe that
    * checkpoints during setup and counts inside time{} fails with a
    * missing-block error, not a slow measurement. All current probes
    * comply; keep it that way. */
  private def time(f: => Long): (Double, Long) = {
    preTimer()
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  /** Box-speed reading bracketing a probe run (round 13, verdict item
    * 6): round 12's ×64 warm minimums sat uniformly ~2× over round-11
    * receipts purely from host state, and the attribution lived in
    * prose. Run the first 5 MiniBench panel queries at the PROTOCOL
    * sf0.1 dir under the isolated 3-trial-minimum protocol (one
    * untimed warmup pass first) and take the median ratio to the
    * recorded MiniBench best-knowns — the same BenchGuard.boxIndex
    * number the bench artifacts carry, so probe rows are normalizable
    * post-hoc. None when BASELINE.md has no history for the head (e.g.
    * run outside the repo). Attribution only; never adjusts a probe
    * row. */
  private def boxHead(spark: SparkSession): Option[Double] = {
    val md =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("BASELINE.md"))
      catch { case _: Throwable => "" }
    val best = BenchGuard.miniHistory(md).map { case (q, h) => q -> h.min }
    val head = MiniBench.Panel.take(5).filter(best.contains)
    if (head.isEmpty) return None
    val proto = "/root/testdata/sf0.1" // best-knowns are recorded here
    try {
      head.foreach { q => // untimed warmup
        SparkEntry.queries(q)(spark, proto).count(); preTimer()
      }
      val res = head.map { q =>
        val ts = (0 until 3).map { _ =>
          preTimer()
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, proto).count()
          (System.nanoTime() - t0) / 1e9
        }
        q -> ts.min
      }
      BenchGuard.boxIndex(res, best)
    } catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (facArgs, nameArgs) =
      args.partition(a => a.nonEmpty && a.forall(_.isDigit))
    val factors =
      if (facArgs.nonEmpty) facArgs.map(_.toInt).toSeq else Seq(16, 64)
    if (nameArgs.nonEmpty) only = Some(nameArgs.toSeq)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    preTimer = () => {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // experiment passthrough: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" for runtime
    // SQL confs (join strategy, partition counts) without code edits
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })

    val results = scala.collection.mutable.ArrayBuffer[(String, Int, Double, Long)]()

    val boxBefore = boxHead(spark)

    for (n <- factors) {
      val docs = replicateDocs(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), n)

      // LSH minhash dedup over the replicated corpus (native kernels)
      if (want("minhash_lsh_pairs")) {
      val (tMh, rMh) = time(Dedup.minhashDupPairsDf(docs).count())
      results += (("minhash_lsh_pairs", n, tMh, rMh))
      }

      // SimHash near-dup groups — the PRODUCTION path (Dedup.simhashGroupsDf)
      if (want("simhash_groups")) {
      val (tSh, rSh) = time(Dedup.simhashGroupsDf(docs).count())
      results += (("simhash_groups", n, tSh, rSh))
      }

      // distributed-prefix-sum shard packing — production path
      // (Advanced.shardPackDf)
      if (want("shard_pack")) {
      val (tSp, rSp) = time(
        graft.operators.Advanced.shardPackDf(spark, docs).count())
      results += (("shard_pack", n, tSp, rSp))
      }

      // nearest-centroid assignment (ANN ingest path) — production path
      // (Similarity.nearestCentroid)
      if (want("ivf_assign")) {
      val (tIvf, rIvf) = time {
        val v = replicateKeyed(
          Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("emb")),
          "vec_id", n)
        val cents = Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("cent_id"),
            VectorFunctions.asDouble(col("embedding")).as("cent_emb"))
        graft.similarity.Similarity.nearestCentroid(spark, v, cents)
          .groupBy(col("cent_id")).count().count()
      }
      results += (("ivf_assign", n, tIvf, rIvf))
      }

      // native as-of join (AsOfJoinExec): replicated event stream, the
      // per-partition merge must stay linear — its state is ONE buffered
      // row regardless of key width or time density
      if (want("asof_join")) {
      val (tAsof, rAsof) = time {
        val ev = replicateKeyed(
          Tables.events(spark, sfDir).select(col("user_id"),
            unix_millis(col("ts")).as("ts_ms"), col("event_type")),
          "user_id", n)
        val l = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ms"))
        val r = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts_ms"))
          .agg(count(lit(1)).as("nv"))
        graft.plans.AsOf.join(l, r, Seq("user_id"), "ts_ms", "ts_ms", "_v")
          .count()
      }
      results += (("asof_join", n, tAsof, rAsof))
      }

      // Misra-Gries heavy-hitter sketch over the replicated token stream —
      // sketch state is ≤k entries per mapper, so cost must track the
      // token count, never the vocabulary
      if (want("misra_gries")) {
      val (tMg, rMg) = time {
        docs.select(explode(expr("filter(split(text, ' '), x -> x != '')"))
            .as("word"))
          .agg(graft.functions.AggregateKernels.misraGries(col("word"), 200))
          .count()
      }
      results += (("misra_gries", n, tMg, rMg))
      }

      // Count-Min sketch build over the replicated token stream — fixed
      // width·depth state per mapper (mergeable), so cost must track the
      // token count, never the key universe
      if (want("count_min_build")) {
      val (tCm, rCm) = time {
        docs.select(explode(expr("filter(split(text, ' '), x -> x != '')"))
            .as("word"))
          .withColumn("h", xxhash64(col("word")))
          .stat.countMinSketch("h", 0.0001, 0.99, 42).totalCount()
      }
      results += (("count_min_build", n, tCm, rCm))
      }

      // fixed-round Bellman-Ford on a synthetic weighted chain (+reverse):
      // each relax round is one join + one groupBy-MIN, so wall time must
      // track the edge count — rounds are fixed by contract
      if (want("sssp_relax")) {
      val (tSs, rSs) = time {
        val ids = spark.range(0L, 20000L * n).toDF("id")
        val fwd = ids.filter(col("id") > 0)
          .select((col("id") - 1).as("src"), col("id").as("dst"),
            (lit(1.0) / ((col("id") % 5) + 1)).as("w"))
        val e2 = fwd.unionAll(fwd.select(col("dst").as("src"),
          col("src").as("dst"), col("w")))
        val seeds = ids.filter(col("id") % 1024 === 0)
          .select(col("id").as("node"))
        graft.operators.Graph.shortestPathsEdges(e2, seeds, 4).count()
      }
      results += (("sssp_relax", n, tSs, rSs))
      }

      // KLL quantile sketch over the replicated price stream — summary
      // state is O(k log n) per group per mapper, so cost must track the
      // scan, never the value count
      if (want("kll_sketch")) {
      val (tKll, rKll) = time {
        val li = replicateKeyed(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_extendedprice").cast("double").as("v")), "l_orderkey", n)
        li.groupBy(col("l_returnflag"))
          .agg(graft.functions.KllSketch.kllSketch(col("v"), 200).as("s"))
          .count()
      }
      results += (("kll_sketch", n, tKll, rKll))
      }

      // shuffle join + agg (the relational heavyweight)
      if (want("join_agg")) {
      val (tJ, rJ) = time {
        val li = replicateKeyed(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_extendedprice")), "l_orderkey", n)
        val o = replicateKeyed(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderpriority")), "o_orderkey", n)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)), sum(col("l_extendedprice"))).count()
      }
      results += (("join_agg", n, tJ, rJ))
      }

      // bloom-pruned semi join: the fact side is replicated, the dim side
      // is NOT — the sketch stays fixed-size, so the probe must scale with
      // the fact scan (map work), while the shuffle carries only the
      // ~matching fraction regardless of n
      if (want("bloom_semi_join")) {
      val (tBl, rBl) = time {
        val dim = Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_custkey") % 7 === 0)
          .select(col("o_orderkey"))
        val bloom = dim.stat.bloomFilter("o_orderkey", 20000, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        val fact = replicateKeyed(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_quantity")), "l_orderkey", n)
        fact.filter(graft.functions.BloomFilterExpressions
            .mightContainLong(col("l_orderkey"), bos.toByteArray))
          .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy(col("l_orderkey")).count().count()
      }
      results += (("bloom_semi_join", n, tBl, rBl))
      }

      // sweep-line interval concurrency: two-level prefix sum — per-day
      // in-bucket windows parallelize, only day totals cross the global
      // window, so scaling must track the event count
      if (want("interval_sweep")) {
      val (tSw, rSw) = time {
        val ev = replicateKeyed(Tables.events(spark, sfDir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"), col("value")), "event_id", n)
        graft.operators.Advanced.intervalConcurrencyDf(ev).count()
      }
      results += (("interval_sweep", n, tSw, rSw))
      }

      // alternating-star connected components on a synthetic
      // chain+hub graph (path segments of 8 linked to per-64 hubs):
      // rounds are O(log n) by construction, so wall time must track
      // the edge count, never the component diameter
      if (want("connected_components")) {
      val (tCc, rCc) = time {
        val ids = spark.range(0L, 20000L * n).toDF("id")
        val chain = ids.filter(col("id") % 8 =!= 0)
          .select(col("id").as("src"), (col("id") - 1).as("dst"))
        val hub = ids.filter(col("id") % 16 === 0)
          .select(col("id").as("src"),
            (col("id") - (col("id") % 64)).as("dst"))
        graft.operators.Graph.connectedComponents(
          ids.select(col("id").as("node")), chain.unionAll(hub)).count()
      }
      results += (("connected_components", n, tCc, rCc))
      }

      // prefix-filtered exact similarity join, LAST in the loop: its
      // output is quadratic in dup-CLUSTER size by definition (the full
      // synthetic corpus is dup-heavy), so it runs on the q134-contract
      // %4 sample under disjoint-namespace replication — and after the
      // probes whose timings its shuffle/GC pressure would contaminate
      // (the combined run measured cc at 6x; isolated, cc is flat)
      if (want("prefix_filter_join")) {
      val (tPf, rPf) = time(Dedup.prefixFilterJaccardPairsDf(
        replicateDocsDisjoint(
          Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 4 === 0)
            .select(col("doc_id"), col("text")),
          n)).count())
      results += (("prefix_filter_join", n, tPf, rPf))
      }

      // skip-gram co-occurrence (round 5): pair generation is an array
      // HOF in the projection — zero joins — so cost must track the
      // token count and the shuffle only the distinct-pair count
      if (want("skipgram_cooc")) {
      val (tSg, rSg) = time {
        docs.select(expr("filter(split(lower(text), ' '), x -> x != '')")
            .as("w"))
          .select(explode(expr(
            "flatten(transform(w, (x, i) -> filter(array(" +
              "IF(i + 2 <= size(w), named_struct(" +
              "'a', x, 'b', element_at(w, i + 2), 'dist', 1), NULL), " +
              "IF(i + 3 <= size(w), named_struct(" +
              "'a', x, 'b', element_at(w, i + 3), 'dist', 2), NULL)), " +
              "p -> p IS NOT NULL)))")).as("p"))
          .groupBy(col("p.a"), col("p.b")).count().count()
      }
      results += (("skipgram_cooc", n, tSg, rSg))
      }

      // rank-statistic AUC (round 6, q197/q198 shape): the GlobalOrder
      // ordered pass touches only the DISTINCT-SCORE grid. Replicated
      // events repeat the same score values, so the grid stays FLAT
      // (rows counter = grid size) while the reducing scan grows —
      // cost must track the scan, never the ordered pass
      if (want("rank_stats_auc")) {
      val (tRk, rRk) = time {
        val ev = replicateKeyed(Tables.events(spark, sfDir)
          .select(col("event_id"), col("event_type"), col("value")),
          "event_id", n)
        graft.operators.Analytics.aucRankDf(ev).collect()
        ev.select(col("value")).distinct().count()
      }
      results += (("rank_stats_auc", n, tRk, rRk))
      }

      // GlobalOrder global ranking (round 6, q122/q187/q188 shape):
      // range-partitioned two-level prefix sum — the only global window
      // ranks the P-row offset table, so cost must track the row count
      // linearly with no single-partition collapse
      if (want("global_order_rank")) {
      val (tGo, rGo) = time {
        val c = replicateKeyed(Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_acctbal")), "c_custkey", n)
        graft.operators.GlobalOrder
          .rowNumber(c, "rn", col("c_acctbal"), col("c_custkey"))
          .count()
      }
      results += (("global_order_rank", n, tGo, rGo))
      }

      // weighted-Jaccard prefix-filtered pair join (round 7, q231
      // shape): a corpus-wide planted token drives the naive postings
      // join to df² = (n_docs)² candidate pairs; the AllPairs tail
      // exclusion keeps it out of the inverted index (its tf mass is
      // far under β·T for every doc), so cost must track corpus size
      // linearly while df grows linearly and df² quadratically
      if (want("weighted_jaccard_hot")) {
      val (tWj, rWj) = time {
        val planted = replicateDocsDisjoint(
          Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 4 === 0)
            .select(col("doc_id"), col("text")), n)
          .select(col("doc_id"),
            concat(lit("hotboilerplate hotboilerplate "), col("text"))
              .as("text"))
        graft.operators.TextQueries.weightedJaccardPairsDf(planted)
          .count()
      }
      results += (("weighted_jaccard_hot", n, tWj, rWj))
      }

      // capped item-cosine build (round 7, q232 production path): a
      // planted power user touching 1000·n items would contribute
      // (1000·n)² pairs through one join key uncapped; the enforced
      // top-M per-user cap bounds EVERY user at M² pairs, so cost must
      // track the organic interaction volume while the power user's
      // uncapped pair count grows quadratically
      if (want("item_cosine_power_user")) {
      val (tIc, rIc) = time {
        val organic = replicateKeyed(
          Tables.events(spark, sfDir)
            .select(col("user_id").as("u"),
              get_json_object(col("props"), "$.k").cast("int")
                .as("item"), col("ts"))
            .filter(col("item").isNotNull), "u", n)
        val power = spark.range(0L, 1000L * n)
          .select(lit(-1L).as("u"), (col("id") + 1000000).cast("int")
            .as("item"),
            timestamp_micros(lit(1700000000000000L) + col("id"))
              .as("ts"))
        graft.operators.Graph.itemCosineDf(organic.unionAll(power))
          .count()
      }
      results += (("item_cosine_power_user", n, tIc, rIc))
      }

      // semdedup anchor cap (round 7, q256 production path): identical
      // vectors tie on the rounded cosine everywhere, so the lowest-id
      // seed wins EVERY assignment — one mega cluster of 2000·n
      // members through a single join key. Uncapped that is (2000·n)²
      // pair work; the 256-anchor bounded-heap cap must hold it at
      // |c|·256 (linear in n)
      if (want("semdedup_mega_cluster")) {
      val (tSd, rSd) = time {
        val v = spark.range(0L, 2000L * n)
          .select(col("id").as("vec_id"),
            expr("transform(sequence(0, 63), " +
              "i -> CAST(CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END " +
              "AS DOUBLE))").as("emb"))
        graft.similarity.Similarity.semDedupDf(spark, v).count()
      }
      results += (("semdedup_mega_cluster", n, tSd, rSd))
      }

      // substring-dedup window census (round 7, q260 production path):
      // disjoint replica namespaces keep each replica's duplicate
      // structure identical to the base corpus, so window rows, dup
      // rows, and cost must all track corpus tokens LINEARLY — the
      // content-keyed count shape (a window duplicated d times costs d
      // rows, never d²)
      if (want("substring_dedup")) {
      val (tSu, rSu) = time(
        Dedup.substringDedupDf(replicateDocsDisjoint(
          Tables.documents(spark, sfDir)
            .select(col("doc_id"), col("text")), n)).count())
      results += (("substring_dedup", n, tSu, rSu))
      }

      // CCNet scoring (round 7, q263 production path): the en model
      // grows with the en token volume and the scoring join is
      // content-keyed + partial-aggregated, so cost must track corpus
      // tokens — a per-language ranking window or a model broadcast
      // would both break at real vocabulary sizes
      if (want("ccnet_buckets")) {
      val (tCb, rCb) = time {
        val d = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("lang"), col("text"),
            explode(sequence(lit(0L), lit(n - 1L))).as("rep"))
          .select((col("doc_id") * n + col("rep")).as("doc_id"),
            col("lang"),
            concat(col("text"), lit(" rep"), col("rep")).as("text"))
        graft.operators.TextQueries.ccnetBucketsDf(d).count()
      }
      results += (("ccnet_buckets", n, tCb, rCb))
      }

      // snapshot near-dup probe (round 7 continuation, q278 production
      // shape, registry built inline): disjoint replica namespaces PLUS
      // a planted boilerplate header shared by EVERY doc — the header's
      // trigrams are corpus-wide hot keys that survive the panel
      // broadcast semi-join, so the probe measures the worst case of
      // the inverted join. The panel is count-capped (~100 docs at any
      // n), so hot-trigram fan-out is panel×corpus = LINEAR, and total
      // cost must track the registry build, never df².
      if (want("snapshot_neardup_hot")) {
      val (tSn, rSn) = time {
        val d = replicateDocsDisjoint(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
          n)
          .select(col("doc_id"),
            concat(lit("shared header boilerplate block every doc "),
              col("text")).as("text"))
        Dedup.snapshotNeardupDf(d).count()
      }
      results += (("snapshot_neardup_hot", n, tSn, rSn))
      }

      // fuzzy-levenshtein segment join (round 8, q59 production path):
      // the old broadcast nested-loop was n² levenshtein calls (×16
      // bench: 29× time for 16× data). Replicas get a 3-token numeric
      // prefix that forces ≥ 3 edits BETWEEN replicas, so true pairs —
      // and therefore output — grow linearly while the old all-pairs
      // work would grow n²
      if (want("fuzzy_levenshtein_seg")) {
      val (tFz, rFz) = time {
        val names = replicateKeyed(
          Tables.part(spark, sfDir).filter(col("p_partkey") % 20 === 0)
            .select(col("p_partkey").as("key"), col("p_name").as("name")),
          "key", n)
          .select(col("key"), concat(
            lit("r"), (col("key") % n), lit("x"), (col("key") % n),
            lit("x"), (col("key") % n), lit(" "), col("name")).as("name"))
        graft.operators.Advanced.fuzzyLevenshteinPairsDf(names, 2).count()
      }
      results += (("fuzzy_levenshtein_seg", n, tFz, rFz))
      }

      // geo nearest cascade (round 8, q125 production path): supplier
      // DENSITY grows ×n (fixed lat/lon area) — the fixed-grid join's
      // candidate pairs grow n² (×16 bench: 44×); the adaptive cascade
      // shrinks cells as √(1/n) so per-customer candidates stay O(1)
      // and cost tracks the row count
      if (want("geo_nearest_cascade")) {
      val (tGe, rGe) = time {
        val supp = spark.range(0L, 1000L * n)
          .select(col("id").as("s_suppkey"),
            (((col("id") * 41) % 1200) / 10.0 - 60.0).as("slat"),
            (((col("id") * 89) % 3600) / 10.0 - 180.0).as("slon"))
        val cust = spark.range(0L, 1500L * n)
          .select(col("id").as("c_custkey"),
            (((col("id") * 37) % 1200) / 10.0 - 60.0).as("clat"),
            (((col("id") * 73) % 3600) / 10.0 - 180.0).as("clon"))
        graft.operators.Geo.nearestSupplierDf(cust, supp).count()
      }
      results += (("geo_nearest_cascade", n, tGe, rGe))
      }

      // wide (256-bit) image near-dup (round 10, q287 production path):
      // replicated doc keys render ×n distinct 17×16 images (md5-seeded
      // luma → hashes uniform-random), variants planted every 20th key
      // so TRUE pairs grow linearly. 32-bit bands keep expected bucket
      // occupancy n/2³² ≈ 0 at any committed scale, so candidates =
      // true pairs and cost must track the decode+hash scan. (The
      // compact 64-bit operator is NOT probed at scale: its 16-bit
      // bands carry the documented (k+1)·n²/2¹⁶ candidate arm past
      // ~6·10⁵ images — the scaladoc bounds its range and q287 is the
      // scale path.)
      // replicated keys are doc_id·n + rep < (maxDoc+1)·n; past the
      // planted-variant offset they'd COLLIDE with variant asset_ids
      // and distort the true-pair count the linearity claims rest on.
      // Round 12: instead of refusing big factors, pass an offset the
      // replicated range provably clears (the planted geometry is
      // offset-invariant — the generators' own guard still fails
      // loudly if this arithmetic is ever wrong). Production queries
      // keep the 10⁷ default, which the oracle SQL hardcodes.
      lazy val wideOffset: Long = {
        val maxDoc = Tables.documents(spark, sfDir)
          .agg(max(col("doc_id"))).head().getLong(0)
        math.max(graft.multimodal.ImageNeardup.VariantOffset,
          (maxDoc + 1) * n)
      }

      if (want("image_neardup_wide")) {
      val (tIw, rIw) = time {
        val keys = replicateKeyed(
          Tables.documents(spark, sfDir).select(col("doc_id")),
          "doc_id", n)
        graft.multimodal.ImageNeardup.neardupPairsWide(
          graft.multimodal.ImageNeardup.dHashesWide(
            graft.multimodal.ImageNeardup.imageCorpusDf(keys, spark,
              graft.multimodal.ImageNeardup.WideW,
              graft.multimodal.ImageNeardup.WideH, wideOffset), spark))
          .count()
      }
      results += (("image_neardup_wide", n, tIw, rIw))
      }

      // wide (256-bit) audio near-dup (round 11, q290 production path):
      // same design as image_neardup_wide one modality over — replicated
      // keys synthesize ×n distinct PCM clips (per-chunk md5 samples →
      // fingerprints uniform), variants planted every 20th key so TRUE
      // pairs grow linearly; 32-bit bands keep bucket occupancy ≈ 0 at
      // any committed scale, so cost must track the synth→encode→
      // decode→fingerprint scan. (The compact 64-bit fingerprint is NOT
      // probed at scale — same 16-bit-band bound as the compact image
      // hash, documented in the scaladoc; q290 is the scale path.)
      if (want("audio_neardup_wide")) {
      val (tAw, rAw) = time {
        val keys = replicateKeyed(
          Tables.documents(spark, sfDir).select(col("doc_id")),
          "doc_id", n)
        graft.multimodal.ImageNeardup.neardupPairsWide(
          graft.multimodal.AudioNeardup.fingerprintsWide(
            graft.multimodal.AudioNeardup.audioCorpusDf(keys, spark,
              graft.multimodal.AudioNeardup.WideFrames,
              graft.multimodal.AudioNeardup.WideBands, wideOffset),
            spark)).count()
      }
      results += (("audio_neardup_wide", n, tAw, rAw))
      }

      // video near-dup (round 11, q291 production path): 4-frame
      // containers, per-frame dHash, 256-bit temporal stack through the
      // same 8×32-bit banded join — cost must track the 4×-image
      // render+decode scan; true pairs linear via the same every-20th
      // planting
      if (want("video_neardup")) {
      val (tVd, rVd) = time {
        val keys = replicateKeyed(
          Tables.documents(spark, sfDir).select(col("doc_id")),
          "doc_id", n)
        graft.multimodal.ImageNeardup.neardupPairsWide(
          graft.multimodal.VideoNeardup.fingerprints(
            graft.multimodal.VideoNeardup.videoCorpusDf(keys, spark,
              wideOffset), spark),
          graft.multimodal.VideoNeardup.MaxHamming).count()
      }
      results += (("video_neardup", n, tVd, rVd))
      }

      // animated-GIF89a video container (round 12, q293 production
      // path): same fingerprints and planting as video_neardup, but
      // every video goes through multi-frame GIF encode → strict
      // composed decode (4 LZW streams per asset both ways) — cost
      // must stay linear in assets and roughly track the GVID arm
      if (want("video_neardup_gif")) {
      val (tVg, rVg) = time {
        val keys = replicateKeyed(
          Tables.documents(spark, sfDir).select(col("doc_id")),
          "doc_id", n)
        graft.multimodal.ImageNeardup.neardupPairsWide(
          graft.multimodal.VideoNeardup.fingerprints(
            graft.multimodal.VideoNeardup.videoCorpusGifDf(keys, spark,
              wideOffset), spark),
          graft.multimodal.VideoNeardup.MaxHamming).count()
      }
      results += (("video_neardup_gif", n, tVg, rVg))
      }

      // MJPEG lossy video container (round 13, q295 production path):
      // same planting and banded join as the GVID/GIF arms, but every
      // frame passes through REAL JPEG quantization both ways (4 FDCTs
      // + 4 Huffman encodes + the segment-walk split + 4 decodes per
      // asset) — cost must stay linear in assets, true pairs linear
      // via the same every-20th planting, and the no-tie margin must
      // keep candidates = true pairs at every factor (a quantization
      // bit-flip breaking the margin would show up as a pair-count
      // deviation from exactly maxDoc·n/20-ish, not just as time)
      if (want("video_neardup_mjpeg")) {
      val (tVm, rVm) = time {
        val keys = replicateKeyed(
          Tables.documents(spark, sfDir).select(col("doc_id")),
          "doc_id", n)
        graft.multimodal.ImageNeardup.neardupPairsWide(
          graft.multimodal.VideoNeardup.fingerprints(
            graft.multimodal.VideoNeardup.videoCorpusMjpegDf(keys, spark,
              wideOffset), spark),
          graft.multimodal.VideoNeardup.MaxHamming).count()
      }
      results += (("video_neardup_mjpeg", n, tVm, rVm))
      }

      // FIFO costing under a Zipfian hot-part head (round 13, q205
      // production path — the scaladoc's "AQE handles hot parts" claim
      // gets its recorded receipt): organic lineitem replicates ×n with
      // DISJOINT part keys per replica, so per-part lot counts stay at
      // the base distribution and organic cost tracks rows linearly.
      // On top, 8 planted hot parts with a halving lot-count ladder
      // (≈6k, 3k, … ≈47 lots at sf0.1 — Zipf-shaped, far above the
      // ~30-lot organic median) of FIXED content across factors: the
      // per-part interval join is quadratic in lot count BY DESIGN
      // (that is the workload), so pinning the head constant isolates
      // what the claim is about — growth must track the organic scan
      // while the hot keys neither stall the stage nor blow the plan.
      if (want("fifo_costing_skew")) {
      val (tFc, rFc) = time {
        val li = Tables.lineitem(spark, sfDir).select(col("l_partkey"),
          col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_quantity"), col("l_extendedprice"))
        // orderkey replicates by HIGH-bit salting (rep·10⁹ + key), NOT
        // key·n + rep: the receipts/issues split is orderkey PARITY,
        // which an even-n multiply erases — every organic part then
        // holds a single parity, the interval join matches nothing
        // organic, and the probe measures only the hot ladder (the
        // first cut of this probe did exactly that: 8 output rows).
        // High-bit salting preserves parity AND the per-part window
        // order (one rep per salted part, so the rep term is constant
        // within every window partition).
        val organic = li
          .withColumn("rep", explode(sequence(lit(0L), lit(n - 1L))))
          .withColumn("l_orderkey",
            col("rep") * lit(1000000000L) + col("l_orderkey"))
          .withColumn("l_partkey", col("l_partkey") * n + col("rep"))
          .drop("rep")
        val hot = (1 to 8).map { k =>
          li.filter(col("l_partkey") % (100 * (1 << (k - 1))) === 0)
            .withColumn("l_partkey", lit(-k.toLong))
        }.reduce(_ unionAll _)
        graft.operators.Analytics.fifoCostingDf(organic.unionAll(hot))
          .count()
      }
      results += (("fifo_costing_skew", n, tFc, rFc))
      }

      // shingle-containment prefix filter (round 8, q240 production
      // path): disjoint replica namespaces keep true containment pairs
      // linear, and a planted boilerplate header puts corpus-wide HOT
      // 3-grams in every LONG doc — the raw self-join's df² worst case
      // (10⁹+ candidate rows at ×64). Probe design: the header goes
      // only into docs ≥ 60 tokens AND the threshold is 0.3, so the
      // header can never QUALIFY a pair by itself (6 shared shingles
      // < 0.3·40) — with a universal header at the q240 default 0.05,
      // all small-doc pairs GENUINELY qualify and the true output is
      // quadratic, which measures the corpus, not the algorithm (the
      // first probe cut filled the disk with 77 GB of spill learning
      // this). At 0.3 every header doc's o−1 ≥ 11 skips all 6 header
      // shingles from its index: candidate fan-out via the hot keys
      // must be ZERO and cost linear.
      if (want("shingle_containment_hot")) {
      val (tSc, rSc) = time {
        val d = replicateDocsDisjoint(
          Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 5 === 0)
            .select(col("doc_id"), col("text")), n)
          .select(col("doc_id"),
            when(size(expr("filter(split(text, ' '), x -> x != '')"))
                >= 60,
              concat(lit("the of and boiler plate header "), col("text")))
              .otherwise(col("text")).as("text"))
        graft.operators.TextQueries
          .shingleContainmentPairsDf(d, threshold = 0.3).count()
      }
      results += (("shingle_containment_hot", n, tSc, rSc))
      }
    }

    val boxAfter = boxHead(spark)
    val body = results.map { case (p, n, sec, rows) =>
      f"""{"probe":"$p","factor":$n,"sec":$sec%.2f,"rows":$rows}"""
    }.mkString("[", ",", "]")
    // the bracketing box readings ride the artifact so every probe row
    // is host-state-attributable post-hoc (protocol: BASELINE.md notes)
    val boxJs = (boxBefore, boxAfter) match {
      case (Some(a), Some(b)) => f""","box_before":$a%.3f,"box_after":$b%.3f"""
      case (Some(a), None) => f""","box_before":$a%.3f"""
      case (None, Some(b)) => f""","box_after":$b%.3f"""
      case _ => ""
    }
    println(s"""{"metric":"scale_probe","sf":"$sfDir"$boxJs,"results":$body}""")
    spark.stop()
  }
}
