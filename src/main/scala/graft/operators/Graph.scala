package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over DataFrames. The reference has nothing of
  * the kind (SURVEY §2: no joins at all); this belongs to the extension
  * surface — ranking entities of an interaction graph is a standard
  * pretraining-corpus signal (e.g. page importance as a quality prior).
  */
object Graph {

  val Damping = 0.85
  val Iters = 5

  /** Undirected bipartite interaction graph from events: user ↔ prop-k
    * item, both sides namespaced ('u…'/'k…'). Every node of the
    * undirected graph has out-edges, so there is no dangling-mass
    * special case.
    *
    * The edge list is a deterministic corpus function (JSON-extract +
    * distinct over the full events table) consumed by every graph query,
    * so it persists through [[WarehouseCache]] like the ANN index
    * artifacts: built once per events snapshot, read back metadata-only
    * after — per-query cost is a small parquet scan, not a full-table
    * parse. */
  def eventEdges(s: SparkSession, d: String): DataFrame =
    WarehouseCache.cachedParquet(s,
      s"graft_edges_${WarehouseCache.dirSuffix(d)}",
      WarehouseCache.sourceFingerprint(s, d, "events.parquet")) {
      val uk = Tables.events(s, d)
        .select(concat(lit("u"), col("user_id")).as("a"),
          concat(lit("k"), get_json_object(col("props"), "$.k").cast("int"))
            .as("b"))
        .filter(col("b").isNotNull)
        .distinct()
      uk.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(uk.select(col("b").as("src"), col("a").as("dst")))
    }

  /** Fixed-iteration PageRank (damping 0.85, 5 rounds, uniform init over
    * the edge-touched node set). Each round is the classic scalable shape:
    * join ranks to edges on src (rank/out-degree contributions), shuffle
    * ON dst once, partial-aggregated sum — contributions never leave the
    * mappers unsummed. The loop only composes the plan; see the in-loop
    * comment for why there is deliberately NO per-round checkpoint (a
    * convergence-checked loop would need one — this fixed-count loop
    * doesn't).
    *
    * Ranks are rounded to 8 decimals after EVERY round in both this and
    * the oracle's unrolled-CTE formulation: summation order across
    * partitions is engine- (and run-) dependent, and the per-round
    * re-quantization keeps the ~1e-16 float-order noise from ever
    * reaching the comparison precision. */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint, not cache(): these frames are per-invocation
    // scratch — CacheManager entries would outlive the query (storage
    // leak across a long session), while checkpoint blocks are reclaimed
    // by the ContextCleaner once the DataFrames are garbage-collected
    val e = eventEdges(s, d).localCheckpoint()
    // out-degree folds into the rank state once, so each round does ONE
    // join + ONE shuffle-on-dst (not a second per-round degree join)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val n = deg.count() // every node of the undirected graph has out-edges
    // cold-start guard: an empty edge set must yield an empty result, not
    // an ANSI divide-by-zero on the uniform init
    if (n == 0)
      return deg.select(col("src").as("node"), lit(0.0).as("pr"))
    var pr = deg.select(col("src").as("node"),
      round(lit(1.0) / n, 8).as("pr"), col("outdeg"))
    // the loop only COMPOSES the plan (the unrolled-CTE shape the oracle
    // uses): with a fixed iteration count and no mid-loop action there is
    // nothing to checkpoint — one action executes all rounds back to back,
    // instead of eagerly materializing every round. (The label-propagation
    // loop in Dedup checkpoints because it reads a convergence metric each
    // round; PageRank here is convergence-free by construction.)
    for (i <- 0 until Iters) {
      val mass = e
        .join(pr, e("src") === pr("node"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("mass"))
        .select(col("dst").as("node"),
          round(lit(0.15) / n + lit(Damping) * col("mass"), 8).as("pr"))
      pr =
        if (i == Iters - 1) mass
        else mass.join(deg, mass("node") === deg("src"))
          .select(col("node"), col("pr"), col("outdeg"))
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
  }

  /** Connected components via the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SOCC'14) — O(log² n) rounds regardless of graph DIAMETER,
    * which is the property that matters at scale: hash-min label
    * propagation (what [[graft.dedup.Dedup.assignCanonical]] runs on dup
    * clusters, where diameter ≈ 2) needs O(diameter) rounds and dies on
    * path-shaped dup CHAINS (A≈B≈C≈… transitive near-dup drift), while the
    * star operations contract such chains geometrically.
    *
    * Each round is two edge-set rewrites, each a groupBy-on-node shuffle
    * followed by a co-partitioned join back (the join reuses the groupBy's
    * exchange — two shuffles per round total, both proportional to |E|):
    *  - large-star: every node connects its LARGER neighbors to its
    *    neighborhood minimum m = min(Γ(u) ∪ u);
    *  - small-star: with edges oriented (hi→lo), every node connects its
    *    smaller-or-equal neighbors (and itself) to m = min(Γ≤(u) ∪ u).
    * Both preserve connectivity and never emit (v, m) with m ≥ v, so the
    * edge multiset strictly descends lexicographically until the fixpoint —
    * a star forest whose centers are component minima. Convergence is
    * observed as (count, order-independent xxhash64 sum) equality — one
    * tiny aggregate action per round on the already-checkpointed edge set.
    *
    * `nodes` supplies the node universe: isolated nodes (no incident edge)
    * come back as singleton components — a dedup pipeline must keep unique
    * docs, not drop them. Returns (node, comp), comp = min node id of the
    * component. */
  /** Rounds the last [[connectedComponents]] call took to converge —
    * probe/spec instrumentation, not part of the result contract. */
  @volatile var lastRounds: Int = 0

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val dedupEdge = edges.toDF("src", "dst")
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct()
    var e = dedupEdge.localCheckpoint()
    // order-independent edge-set signature; bit_xor can't overflow (a
    // modular SUM of xxhash64s trips the ANSI long-overflow check)
    var sig = e.agg(count(lit(1)),
      expr("bit_xor(xxhash64(hi, lo))")).head().toSeq
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // large-star over both orientations: m = min(neighbors ∪ self),
      // re-link strictly larger neighbors v > u to m (m ≤ u < v, so the
      // emitted pair is already (hi=v, lo=m) oriented)
      val nbrs = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
      // small-star on the (hi→lo) orientation: m = min of the smaller
      // neighborhood, re-link every smaller neighbor AND the center to m
      val smins = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      // the signature rides the checkpoint job via observe() — one
      // action per round, not a checkpoint plus a rescan
      val obs = new org.apache.spark.sql.Observation()
      val ss = ls.join(smins, "hi")
        .select(col("lo").as("v"), col("m"))
        .filter(col("v") =!= col("m"))
        .unionAll(smins.select(col("hi").as("v"), col("m")))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
        .observe(obs, count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(hi, lo))").as("x"))
        .localCheckpoint()
      val nsig = Seq(obs.get("n"), obs.get("x"))
      converged = nsig == sig
      sig = nsig
      e = ss
      round += 1
    }
    lastRounds = round
    // fixpoint edges are star links (member → component min); everything
    // not appearing as a member is its own component (centers + isolated)
    nodes.toDF("node")
      .join(e.select(col("hi").as("node"), col("lo").as("comp")),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
  }

  /** Triangle and wedge statistics over an undirected edge set, using the
    * degree-ordered orientation (Suri & Vassilvitskii, WWW'11): every
    * edge points from the lower-(degree,id) endpoint to the higher under
    * that total order, so each triangle is counted at exactly one vertex
    * and wedge fan-out is bounded by the max ORIENTED out-degree (O(√m)
    * on any graph) — the difference between a feasible and an exploding
    * self-join on skewed graphs. One wedge self-join on the low endpoint
    * + one closing equi-join; wedge counts come from the undirected
    * degree table (no extra pass). Emits the global clustering
    * coefficient 3·triangles / wedges.
    *
    * `edges`: two columns (x, y), already deduped with x < y. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val pairs = edges.toDF("x", "y").localCheckpoint()
    val deg = pairs.select(col("x").as("v"))
      .unionAll(pairs.select(col("y").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("dg"))
      .localCheckpoint()
    val lower = col("dx") < col("dy") ||
      (col("dx") === col("dy") && col("x") < col("y"))
    val oriented = pairs
      .join(deg.select(col("v").as("x"), col("dg").as("dx")), "x")
      .join(deg.select(col("v").as("y"), col("dg").as("dy")), "y")
      .select(when(lower, col("x")).otherwise(col("y")).as("src"),
        when(lower, col("y")).otherwise(col("x")).as("dst"))
      .localCheckpoint()
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("a"), col("e2.dst").as("b"))
    val tri = wedges.join(oriented,
        (col("a") === col("src") && col("b") === col("dst")) ||
          (col("b") === col("src") && col("a") === col("dst")))
      .agg(count(lit(1)).as("n_triangles"))
    val wedgeTotal = deg
      .agg(sum(expr("(dg * (dg - 1)) div 2")).as("n_wedges"),
        count(lit(1)).as("n_nodes"))
    val edgeTotal = pairs.agg(count(lit(1)).as("n_edges"))
    tri.crossJoin(wedgeTotal).crossJoin(edgeTotal)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(col("n_triangles") * 3.0 /
          when(col("n_wedges") > 0, col("n_wedges")), 6).as("clustering"))
  }

  /** Triangle census of the 3-NN GRAPH over the embedding corpus — the
    * local-coherence diagnostic of an embedding space (a healthy metric
    * space closes many of its neighbor wedges; random vectors close
    * ~none). The census over the kNN graph is linear (≤ 3n directed
    * edges), but the brute-force kNN BUILD is quadratic in the sample —
    * so the sample is SCALE-CAPPED: modulus = max(2, ⌈n/1000⌉) keeps the
    * panel at ~1000-2000 vectors at every corpus size (a clustering
    * coefficient is a statistical diagnostic; a fixed-size panel
    * estimates it as well at 100 TB as at 1 GB — the q271 fixed-panel
    * argument). At the committed test scales n ≤ 2000 the modulus is 2,
    * so every recorded result is unchanged; the ×16 corpus (32 k
    * vectors) drops from 256 M pair evaluations to ~1 M. Similarities
    * round to 6 decimals BEFORE ranking (q30's convention) so the
    * neighbor sets — and hence the census — are deterministic
    * cross-engine; the modulus derives from the exact corpus count, so
    * both engines pick the same panel. */
  def knnTriangles(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val n = Tables.embeddings(s, d).count()
    val m = math.max(2L, (n + 999L) / 1000L)
    val v = Tables.embeddings(s, d)
      .filter(col("vec_id") % m === 0)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
    val knn = v.select(col("vec_id").as("src"), col("emb").as("e1"))
      .repartition(s.sparkContext.defaultParallelism, col("src"))
      .join(broadcast(v.select(col("vec_id").as("dst"),
        col("emb").as("e2"))), col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        round(cosine(col("e1"), col("e2")), 6).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
    val und = knn
      .select(least(col("src"), col("dst")).as("x"),
        greatest(col("src"), col("dst")).as("y"))
      .distinct()
    triangleStats(und)
  }

  /** Duplicate CLUSTERS over the oracle-checkable near-dup pair graph:
    * components of the exact n-gram-Jaccard ≥ 0.8 pairs on the doc_id % 4
    * sample, singletons (unique docs) included. This is the operator a
    * dedup pipeline actually ends with — [[connectedComponents]] turns
    * q26-style PAIRS into keep/drop GROUPS, and transitive chains (A≈B≈C
    * where A̸≈C) land in one cluster. Oracle: DuckDB recursive min-label
    * walk over the identical pair set. */
  def docDupComponents(s: SparkSession, d: String): DataFrame =
    connectedComponents(
      Tables.documents(s, d).filter(col("doc_id") % 4 === 0)
        .select(col("doc_id")),
      graft.dedup.Dedup.ngramJaccardPairs(s, d, threshold = 0.8)
        .select(col("doc_a"), col("doc_b")))
      .toDF("doc_id", "comp")

  /** Semi-supervised label propagation (community detection with clamped
    * seeds): a third of the item nodes (k % 3 == 0) are seeded with their
    * own id; every OTHER node adopts, each synchronous round, the most
    * frequent label among its neighbors (ties: higher count wins, then the
    * smaller label — fully deterministic, unlike classic LPA's random
    * tie-break, which is what makes this ORACLE-CHECKABLE). Unlabeled
    * neighbors don't vote; a node with no labeled neighbor stays null.
    * Labels reach unseeded items through the users between them
    * (bipartite graph: round 1 labels users from seed items, round 2
    * labels the remaining items from users, round 3 re-votes users with
    * the full item labeling).
    *
    * Scale shape per round: one groupBy-(dst,label) shuffle, the ranking
    * window rides the SAME hash partitioning (dst ⊂ (dst,label) — no
    * second exchange), then a left join back to the node table. The loop
    * only composes the plan (fixed rounds, no convergence read —
    * PageRank's compose-only pattern above). */
  def labelPropagation(s: SparkSession, d: String,
      rounds: Int = 3): DataFrame = {
    val e = eventEdges(s, d).localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct()
      .withColumn("seed",
        when(col("node").startsWith("k") &&
          substring(col("node"), 2, 12).cast("int") % 3 === 0,
          substring(col("node"), 2, 12).cast("int")))
      .localCheckpoint()
    var lbl = nodes.select(col("node"), col("seed").as("lbl"))
    for (_ <- 1 to rounds) {
      val voters = lbl.filter(col("lbl").isNotNull)
        .select(col("node").as("vn"), col("lbl").as("vl"))
      val counts = e.join(voters, e("src") === col("vn"))
        .groupBy(col("dst"), col("vl")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("c").desc, col("vl"))
      val mode = counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("dst").as("node"), col("vl").as("nl"))
      lbl = nodes.join(mode, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("seed"), col("nl")).as("lbl"))
    }
    lbl
  }

  /** Multi-source weighted shortest paths, fixed-round Bellman-Ford over
    * the interaction graph. Edge weight = round(1/interactions, 6) — heavy
    * interaction pairs are "close". Each relax round is one join (dist ⋈
    * edges on src) + one groupBy-node MIN — and MIN, unlike double
    * summation, is reassociation-safe, so the result needs NO per-round
    * quantization to hash-match the oracle: every path's distance is the
    * same left-to-right chain of additions in both engines. Fixed `rounds`
    * hops bound the plan exactly like the oracle's unrolled CTEs
    * (convergence-free compose-only loop, PageRank's pattern). */
  /** Interaction-count-weighted edges (w = round(1/cnt, 6), both
    * orientations) — a deterministic corpus function like [[eventEdges]],
    * so it persists through [[WarehouseCache]] on the same fingerprint
    * contract. */
  def weightedEventEdges(s: SparkSession, d: String): DataFrame =
    WarehouseCache.cachedParquet(s,
      s"graft_wedges_${WarehouseCache.dirSuffix(d)}",
      WarehouseCache.sourceFingerprint(s, d, "events.parquet")) {
      val uk = Tables.events(s, d)
        .select(concat(lit("u"), col("user_id")).as("a"),
          concat(lit("k"), get_json_object(col("props"), "$.k").cast("int"))
            .as("b"))
        .filter(col("b").isNotNull)
      val pair = uk.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
        .select(col("a"), col("b"), round(lit(1.0) / col("cnt"), 6).as("w"))
      pair.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .unionByName(
          pair.select(col("b").as("src"), col("a").as("dst"), col("w")))
    }

  def shortestPaths(s: SparkSession, d: String,
      rounds: Int = 6): DataFrame = {
    val e = weightedEventEdges(s, d).localCheckpoint()
    // seed predicate over the edge srcs — a 'u' node exists iff the user
    // has some valid-k event, so this is the same seed set as filtering
    // the raw events (and skips the second events scan)
    val seeds = e
      .filter(col("src").startsWith("u") &&
        substring(col("src"), 2, 12).cast("long") % 100 === 0)
      .select(col("src").as("node")).distinct()
    shortestPathsEdges(e, seeds, rounds)
  }

  /** The relax loop over any weighted edge set (src, dst, w) and seed
    * node set — shared by the driver query and the scale probe, so what
    * the probe measures IS the production path. */
  def shortestPathsEdges(e: DataFrame, seeds: DataFrame,
      rounds: Int, broadcastDistLimit: Long = 5000000L): DataFrame = {
    var dist = seeds.toDF("node").withColumn("dist", lit(0.0))
      .localCheckpoint()
    var distCount = dist.count()
    for (i <- 1 to rounds) {
      // size-gated broadcast (round 14, the bfsReachability pattern):
      // the distance vector is orders of magnitude smaller than the
      // edge table, so while it fits, each relax round joins map-side
      // and the EDGES NEVER MOVE — without the hint the planner
      // sort-merge-joins, re-shuffling and re-sorting the edge table
      // every round (2 exchanges × rounds). Past the limit the round
      // falls back to the shuffled join (a billion-node distance vector
      // has no business broadcast). The checkpoint makes the count a
      // cached-block read, not a recompute.
      val distSide =
        if (distCount <= broadcastDistLimit) broadcast(dist) else dist
      dist = dist
        .unionByName(e.join(distSide, e("src") === distSide("node"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist")))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      // each round reads `dist` TWICE (carry-over ∪ relax) — unlike
      // PageRank's single-reference loop, composing lazily here doubles
      // the subplan per round (2^rounds recompute, measured 11 s at
      // sf0.1); the node-vector is tiny, so an eager per-round
      // checkpoint is the right trade everywhere above toy scale
      if (i < rounds) { dist = dist.localCheckpoint(); distCount = dist.count() }
    }
    dist.select(col("node"), round(col("dist"), 6).as("dist"))
  }

  /** Bounded multi-source BFS over the interaction graph: hop distance
    * from the seed users (user_id % 100 == 0) out to `rounds` hops. Each
    * round expands the FRONTIER only (newly-reached nodes) — per-round
    * work is proportional to the frontier's edge neighborhood, not the
    * visited set, which is what lets hop-bounded traversals run on
    * billion-edge graphs.
    *
    * Shuffle shape: the frontier and the visited NODE SET are orders of
    * magnitude smaller than the edge table, so both sides of every
    * per-round join are broadcast — the edges NEVER move. Each round is
    * edges ⋈ broadcast(frontier) (map-side) → distinct over just the
    * frontier's neighborhood (the one real shuffle) → left_anti against
    * broadcast(visited) (map-side again). Rounds checkpoint (they gate
    * the next round — unlike PageRank's compose-only loop there IS a
    * per-round dependency), and the loop exits early once the frontier
    * empties. Past `broadcastVisitedLimit` reached nodes the anti join
    * falls back to the shuffled form (a billion-node visited set has no
    * business on the driver). Oracle: DuckDB WITH RECURSIVE breadth
    * expansion + min(dist). */
  def bfsReachability(s: SparkSession, d: String, rounds: Int = 4,
      broadcastVisitedLimit: Long = 5000000L): DataFrame = {
    val e = eventEdges(s, d).localCheckpoint()
    val seeds = Tables.events(s, d)
      .filter(col("user_id") % 100 === 0)
      .filter(get_json_object(col("props"), "$.k").isNotNull)
      .select(concat(lit("u"), col("user_id")).as("node")).distinct()
    var frontier = seeds.withColumn("dist", lit(0)).localCheckpoint()
    var frontierSize = frontier.count()
    val frames = scala.collection.mutable.ArrayBuffer(frontier)
    var visited = frontier.select(col("node"))
    var visitedCount = frontierSize
    var i = 1
    while (i <= rounds && frontierSize > 0) {
      val anti =
        if (visitedCount <= broadcastVisitedLimit) broadcast(visited)
        else visited
      val next = e
        .join(broadcast(frontier.select(col("node").as("f_node"))),
          e("src") === col("f_node"))
        .select(col("dst").as("node")).distinct()
        .join(anti, Seq("node"), "left_anti")
        .withColumn("dist", lit(i))
        .localCheckpoint()
      frames += next
      visited = visited.unionByName(next.select(col("node")))
      frontierSize = next.count()
      visitedCount += frontierSize
      frontier = next
      i += 1
    }
    frames.reduce(_ unionByName _)
  }

  /** Adamic-Adar link prediction over the bipartite interaction graph:
    * for each of the [[AaQueries]] lowest-id query users, the top-5
    * candidate users ranked by AA = Σ_k 1/ln(deg(k)) over shared items
    * k — the classic common-neighbor index that down-weights popular
    * items. The per-QUERY-user formulation is the one that scales:
    * all-pairs AA is quadratic in users (item degrees here grow
    * linearly with the corpus), while candidate generation for a query
    * set is bounded by |queries| × Σ deg(items of query). Per-pair
    * sums of the 1/ln terms run in DECIMAL(30,12) — each term is one
    * division on an exact integer degree, quantized at 9dp so the
    * engines' last-ulp ln() differences cannot move the decimal cast;
    * reassociation is then lossless. Ranking is (exact decimal score
    * desc, candidate id) — fully deterministic. At 100 TB: one shuffle
    * builds (user, item) distinct, the query set broadcasts, and the
    * candidate join shuffles on item only for query-touched items. */
  val AaQueries = 25

  def adamicAdar(s: SparkSession, d: String): DataFrame = {
    val uk = Tables.events(s, d)
      .select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull)
      .distinct()
      .localCheckpoint() // degree pass + both sides of the candidate join
    val deg = uk.groupBy(col("k")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2)
      .select(col("k"), round(lit(1.0) / log(col("deg")), 9).as("term"))
    val queries = uk.select(col("u")).distinct()
      .orderBy(col("u")).limit(AaQueries)
    val qItems = uk.join(broadcast(queries), Seq("u"))
      .select(col("u").as("q"), col("k"))
      .join(deg, Seq("k"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("aa_exact").desc, col("cand"))
    qItems
      .join(uk.select(col("k"), col("u").as("cand")), Seq("k"))
      .filter(col("q") =!= col("cand"))
      .groupBy(col("q"), col("cand"))
      .agg(sum(col("term").cast("decimal(30,12)")).as("aa_exact"),
        count(lit(1)).as("common"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q"), col("cand"), col("rk"), col("common"),
        round(col("aa_exact"), 6).cast("double").as("aa"))
  }

  /** Degree assortativity of the interaction graph: the Pearson
    * correlation of endpoint degrees over the directed edge list (both
    * directions, so the coefficient is the undirected one). Every sum
    * in the correlation is an EXACT integer sum (degrees are counts;
    * their products fit comfortably in long), so the final expression
    * is a fixed handful of IEEE ops on identical integers — no float
    * summation anywhere. At 100 TB: degrees are one map-side-combined
    * aggregate, the two degree attachments shuffle on node id, and the
    * moment reduction is a single-row partial agg. */
  def assortativity(s: SparkSession, d: String): DataFrame = {
    val e = eventEdges(s, d)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint() // attached on both endpoints
    val xy = e.join(deg.select(col("src"), col("deg").as("x")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("y")), Seq("dst"))
    xy.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").as("n_edges"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy"))
              .cast("double"))), 6).as("assortativity"),
        round(col("sx") / col("n").cast("double"), 4).as("avg_deg"))
  }

  /** 3-core of the interaction graph via iterative peeling: drop every
    * node with degree < 3, delete its edges, repeat until stable — the
    * standard k-core fixpoint (the result is order-independent, so the
    * synchronous rounds here equal the sequential textbook peel). Each
    * round is one degree aggregate plus two semi-join-shaped edge
    * restrictions on an edge set that only SHRINKS — per-round cost is
    * proportional to the surviving subgraph, and the per-round edge
    * count rides the checkpoint job via observe() (no extra action).
    * Convergence is edge-count stability; the round cap only guards the
    * oracle's fixed unroll and a violation throws rather than returning
    * a non-fixpoint. At 100 TB: every round shuffles on node id only,
    * the degree aggregate is map-side-combined, and peeling rounds on
    * real interaction graphs are few (degeneracy cascades, not
    * diameter). */
  def threeCore(s: SparkSession, d: String,
      maxRounds: Int = 15): DataFrame = {
    var e = eventEdges(s, d).localCheckpoint()
    var prev = -1L
    var cnt = e.count()
    var rounds = 0
    while (rounds < maxRounds && cnt != prev) {
      prev = cnt
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).select(col("src"))
      val obs = new org.apache.spark.sql.Observation()
      e = e.join(keep, Seq("src"))
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"))
        .select(col("src"), col("dst"))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      cnt = obs.get("n").asInstanceOf[Long]
      rounds += 1
    }
    require(cnt == prev, s"3-core peeling not stable after $maxRounds rounds")
    e.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM'99) as an EXACT INTEGER
    * power iteration: with h₀ = 1 and no per-round normalization, every
    * authority/hub score is a path count — pure long arithmetic, so the
    * whole iterate is bit-exact under any partitioning and the oracle
    * needs no per-round float pinning (cf. [[pagerank]]'s round-to-8
    * discipline, which this construction makes unnecessary). Scores are
    * scale-free, so the output normalizes ONCE by the max (a
    * deterministic long), one IEEE division per row. Three rounds keep
    * the largest path count < 2⁵³ on any graph this pipeline feeds
    * (bounded by n·deg_max⁶); deeper iterates would switch to the
    * pagerank-style per-round rounding instead. Like [[pagerank]], the
    * loop only composes the plan — each round is one join + one
    * shuffle-on-endpoint with partial aggregation, and no mid-loop
    * action means no checkpoint. */
  def hits(s: SparkSession, d: String, rounds: Int = 3): DataFrame = {
    val e = eventEdges(s, d).localCheckpoint()
    var h = e.select(col("src").as("node")).distinct()
      .withColumn("h", lit(1L))
    var a = h.select(col("node"), col("h").as("a")) // placeholder pre-loop
    for (_ <- 1 to rounds) {
      a = e.join(h.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
        .select(col("dst").as("node"), col("a"))
      h = e.join(a.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src")).agg(sum(col("a")).as("h"))
        .select(col("src").as("node"), col("h"))
    }
    val joined = a.join(h, Seq("node"))
    val mx = joined.agg(max(col("a")).as("ma"), max(col("h")).as("mh"))
    joined.crossJoin(broadcast(mx))
      .select(col("node"), col("a").as("auth_raw"), col("h").as("hub_raw"),
        round(col("a") / col("ma"), 6).as("auth"),
        round(col("h") / col("mh"), 6).as("hub"))
  }

  /** Grid-based DBSCAN over the customer (total-spend, order-count)
    * plane: points bin into fixed cells, cells with ≥ minPts points are
    * core, and core cells within Chebyshev distance 1 merge into
    * clusters via [[connectedComponents]] — density clustering as a
    * composition of operators the engine already has. The neighbor
    * relation is built scalably as a 9-stencil EQUI-join (each core
    * cell emits its 3×3 neighbor keys; matching is a hash join on the
    * key), not an |cells|² theta-join — at 100 TB the stencil is the
    * difference between a broadcastable join and a cross product. Point
    * counts, cell ids and extents are all exact integers; there are no
    * floats anywhere in the query. */
  def gridDbscan(s: SparkSession, d: String, sx: Long = 50000L,
      sy: Long = 2L, minPts: Long = 12L): DataFrame = {
    val pts = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice"), 0).cast("long")).as("spend"),
        count(lit(1)).as("n"))
    val cells = pts
      .select((col("spend") / sx).cast("long").as("cx"),
        (col("n") / sy).cast("long").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("pts"))
    val core = cells.filter(col("pts") >= minPts)
      .withColumn("id", col("cx") * 1000 + col("cy"))
      .localCheckpoint() // consumed by stencil, CC nodes, and the rollup
    // 9-stencil neighbor keys → equi-join on the TRUE (cx, cy) pair
    // finds all core pairs at Chebyshev distance ≤ 1 (self-pairs
    // filtered). Joining on the coordinate pair, not the packed id,
    // keeps adjacency exact for any cell range — the packed id is a
    // LABEL only (same cx*1000+cy formula as the oracle), never a
    // join key, so id aliasing cannot fabricate or merge adjacencies.
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = core.select(col("id"), col("cx"), col("cy"),
        explode(array(offsets: _*)).as("o"))
      .select(col("id"), (col("cx") + col("o.dx")).as("ncx"),
        (col("cy") + col("o.dy")).as("ncy"))
    val edges = probes
      .join(core.select(col("id").as("nid"), col("cx").as("bcx"),
          col("cy").as("bcy")),
        col("ncx") === col("bcx") && col("ncy") === col("bcy"))
      .filter(col("id") =!= col("nid"))
      .select(col("id").as("src"), col("nid").as("dst"))
    // The FIXED grid bounds the core-cell count at ANY corpus size
    // (cells ≤ spend_range/sx · count_range/sy — a geometry constant,
    // not a data volume), so the cell graph is driver-scale by
    // construction and a local union-find beats 3-4 distributed CC
    // rounds of checkpoint+shuffle machinery. The distributed
    // [[connectedComponents]] stays as the fallback for a degenerate
    // configuration; both produce comp = min member id, so the choice
    // is invisible in the result (oracle + spec unchanged).
    val coreRows = core.select(col("id")).limit(100001).collect()
    val lbl =
      if (coreRows.length > 100000)
        connectedComponents(core.select(col("id")), edges)
      else {
        val parent = scala.collection.mutable.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        coreRows.foreach(r => parent(r.getLong(0)) = r.getLong(0))
        edges.select(col("src"), col("dst")).collect().foreach { r =>
          val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
          if (a != b) { // min root wins → comp = min member id
            if (a < b) parent(b) = a else parent(a) = b
          }
        }
        val s = core.sparkSession
        import s.implicits._
        parent.keys.toSeq.map(k => (k, find(k))).toDF("node", "comp")
      }
    core.join(lbl, core("id") === lbl("node"))
      .groupBy(col("comp").as("cluster"))
      .agg(count(lit(1)).as("n_cells"), sum(col("pts")).as("n_pts"),
        min(col("cx")).as("cx_min"), max(col("cx")).as("cx_max"),
        min(col("cy")).as("cy_min"), max(col("cy")).as("cy_max"))
  }

  /** Bipartite projection to item-item cosine similarity — the
    * collaborative-filtering item-sim build: two items' similarity is
    * co-engagement count over the geometric mean of their user counts,
    * sim(i,j) = c_ij / √(dᵢ·dⱼ), top-5 per item. The pair join is the
    * per-user self-join of the (user, item) incidence list, so its
    * blowup is Σᵤ deg(u)² — and "bounded by per-user activity" is
    * ENFORCED, not assumed: each user's interaction list is capped to
    * its `maxPerUser` most recent items (deterministic: max engagement
    * ts desc, item asc tie-break) BEFORE the pair join, the standard
    * production item-sim discipline. One power user with 10k items is
    * otherwise 10⁸ pairs in a single join key; capped, every user
    * contributes ≤ M² pairs, so the join is ≤ M²·|users| at ANY scale
    * (ScaleProbe `item_cosine_power_user` plants such a user and holds
    * the cost flat). Estimator effect: co-engagement counts (and item
    * degrees, computed from the SAME capped incidence so the cosine
    * stays internally consistent) undercount hyper-active users —
    * exactly the users whose co-engagements are least informative.
    * Degrees broadcast; counts are exact longs; sim is two IEEE ops;
    * ranking orders on the ROUNDED sim with item tie-break (q30
    * idiom). */
  def itemCosine(s: SparkSession, d: String, k: Int = 5,
      maxPerUser: Int = 64): DataFrame =
    itemCosineDf(Tables.events(s, d)
      .select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        col("ts"))
      .filter(col("item").isNotNull), k, maxPerUser)

  /** [[itemCosine]] over an arbitrary (u, item, ts) interaction frame —
    * the production path ScaleProbe drives with a planted power user. */
  def itemCosineDf(interactions: DataFrame, k: Int = 5,
      maxPerUser: Int = 64): DataFrame = {
    val wCap = Window.partitionBy(col("u"))
      .orderBy(col("last_ts").desc, col("item"))
    val uk = interactions
      .groupBy(col("u"), col("item")).agg(max(col("ts")).as("last_ts"))
      .withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= maxPerUser)
      .select(col("u"), col("item"))
      .localCheckpoint() // both pair-join sides + the degree pass
    val deg = uk.groupBy(col("item")).agg(count(lit(1)).as("deg"))
    val pairs = uk.select(col("u"), col("item").as("i"))
      .join(uk.select(col("u"), col("item").as("j")), Seq("u"))
      .filter(col("i") =!= col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("i"))
      .orderBy(col("sim").desc, col("j"))
    pairs
      .join(broadcast(deg.select(col("item").as("i"),
        col("deg").as("di"))), Seq("i"))
      .join(broadcast(deg.select(col("item").as("j"),
        col("deg").as("dj"))), Seq("j"))
      .select(col("i"), col("j"), col("c"),
        round(col("c") / sqrt((col("di") * col("dj")).cast("double")), 6)
          .as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Exact 1-hop / 2-hop reach for a deterministic QUERY SET (node ids
    * ending in '0' — every 10th entity of both partitions) — the
    * friend-of-friend feature. The 2-hop set is the classic wedge join
    * e(a,b)⋈e(b,c) with the source filter applied BEFORE the wedge
    * expands, so the generated volume is Σ_b deg_in(b|queries)·deg(b),
    * not the full Σ deg², and the one wide shuffle is the distinct on
    * (a, c) pairs. Computing exact reach for EVERY node at corpus scale
    * is deliberately out of scope — all-nodes neighborhood sizes are
    * what HLL sketch propagation (HyperANF) is for; the exact wedge
    * path is the per-query-set feature builder. Self-loops excluded;
    * counts exact. */
  /** HyperANF (Boldi-Rosa-Vigna, WWW'11): approximate neighborhood
    * sizes for EVERY node via HLL sketch propagation — the scale path
    * [[twoHopReach]]'s doc points at. Per node the state is ONE fixed-
    * size HLL sketch; each round unions every node's sketch with its
    * neighbors' (one join + one hll_union_agg shuffle — register-wise
    * max, so merge order cannot change a sketch), after which
    * hll_sketch_estimate reads |N≤r(v)| out. Round cost is |E|·sketch
    * bytes regardless of how large the true neighborhoods get — the
    * wedge blowup that forces [[twoHopReach]] to a query set never
    * happens. The query joins the round-2 estimates against the EXACT
    * wedge-join counts on the query set and reports relative error
    * (the estimate includes the node itself — undirected graphs always
    * close a→b→a — so exact+1 is the comparison target). Rows-only at
    * the driver gate (DuckDB has no HLL); GraphSpec bounds the error. */
  def hyperAnf(s: SparkSession, d: String, rounds: Int = 2): DataFrame = {
    val e = eventEdges(s, d).localCheckpoint()
    // round 1: sketch of the direct neighborhood ∪ self
    var sk = e.groupBy(col("src").as("node"))
      .agg(hll_union(hll_sketch_agg(col("dst")),
        hll_sketch_agg(col("src"))).as("hll"))
      .localCheckpoint() // referenced twice per propagation round
    for (_ <- 2 to rounds) {
      // keyed repartition: the propagation join's inputs are byte-small
      // (edge pairs + one sketch row per node) so AQE coalesces it to
      // 1-2 partitions, but its output is |E| rows EACH CARRYING A
      // 1.5 KB SKETCH and the partial hll_union_agg on top is the
      // round's CPU — pin the width so the register merges spread
      val prop = e
        .repartition(e.sparkSession.sparkContext.defaultParallelism,
          col("dst"))
        .join(sk.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(hll_union_agg(col("hll")).as("nh"))
      sk = sk.join(prop, Seq("node"))
        .select(col("node"), hll_union(col("hll"), col("nh")).as("hll"))
        .localCheckpoint()
    }
    val est = sk.select(col("node"),
      hll_sketch_estimate(col("hll")).as("est"))
    twoHopReachOf(e) // share the pinned edge list — no second
      // eventEdges derivation + checkpoint for the exact arm
      .join(est, Seq("node"))
      .select(col("node"), col("n_2hop"),
        round(col("est"), 2).as("est_incl_self"),
        round(abs(col("est") - (col("n_2hop") + 1)) /
          (col("n_2hop") + 1), 4).as("rel_err"))
  }

  /** Driver-checkable form of [[hyperAnf]] (q250): the exact 2-hop
    * neighborhood size per query node (oracle-reproducible — the same
    * recursive expansion q233 already hash-matches) plus the HyperANF
    * estimate's relative error collapsed to a boolean. Datasketches HLL
    * at default lgK=12 has σ ≈ 1.6%, so the 25% bound is far outside
    * any plausible fluctuation (measured rel_err at sf0.01: 0.0) while
    * still failing loudly if the register propagation breaks. */
  def hyperAnfCheck(s: SparkSession, d: String): DataFrame =
    hyperAnf(s, d)
      .select(col("node"), col("n_2hop"),
        (col("rel_err") <= 0.25).as("est_ok"))

  def twoHopReach(s: SparkSession, d: String): DataFrame =
    twoHopReachOf(eventEdges(s, d).localCheckpoint())

  /** [[twoHopReach]] over an already-pinned edge frame, so callers that
    * hold the edges (hyperAnf's exact arm) don't pay a second derivation
    * and checkpoint. */
  def twoHopReachOf(e: DataFrame): DataFrame = {
    val src = e.filter(col("src").endsWith("0"))
    val oneHop = src.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("n_1hop")) // edge list is already distinct
    // keyed repartition pins the wedge join's width (round 14): AQE
    // sizes the post-shuffle partition count from the JOIN INPUTS
    // (byte-small edge lists → 1-3 partitions) but the wedge join's
    // OUTPUT is Σ deg² rows — the expansion plus the distinct's
    // map-side dedup were running on 1-3 cores. An explicit partition
    // count is exempt from AQE coalescing and forces both join sides
    // to the cluster parallelism (measured: the exact arm 5.2 s →
    // 1.6 s at sf0.1).
    val twoHop = src.select(col("src").as("a"), col("dst").as("b"))
      .repartition(e.sparkSession.sparkContext.defaultParallelism,
        col("b"))
      .join(e.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
      .filter(col("a") =!= col("c"))
      .select(col("a"), col("c"))
      // reach within ≤2: union the direct neighbors (some 2-hop targets
      // are also 1-hop); ONE distinct deduplicates wedges and overlap
      .unionByName(src.select(col("src").as("a"), col("dst").as("c")))
      .distinct()
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("n_2hop"))
    oneHop.join(twoHop, Seq("node"))
  }
}
