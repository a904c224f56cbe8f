package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pagerank conserves probability mass and stays positive") {
    val pr = Graph.pagerank(spark, sf0001).cache()
    // undirected graph, no dangling mass: total rank stays ~1 (up to the
    // per-round re-quantization, which moves < n * 5e-9)
    val total = pr.agg(sum($"pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-3, s"total mass $total")
    assert(pr.filter($"pr" <= 0).count() === 0)
    // both node namespaces present
    assert(pr.filter($"node".startsWith("u")).count() > 0)
    assert(pr.filter($"node".startsWith("k")).count() > 0)
  }

  test("pagerank ranks higher-degree nodes above leaf nodes on a fixture") {
    // star: hub h connects to s1..s4; extra chain a-b. Hub must outrank
    // every spoke; within the 4-cycle-free star, spokes tie.
    val uk = Seq(("h", "s1"), ("h", "s2"), ("h", "s3"), ("h", "s4"),
      ("a", "b")).toDF("a", "b")
    val e = uk.select($"a".as("src"), $"b".as("dst"))
      .unionByName(uk.select($"b".as("src"), $"a".as("dst")))
    // run the same per-round computation Graph.pagerank does, on the
    // fixture edges (pagerank() itself is bound to the events table)
    val deg = e.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select($"src".as("node")).distinct()
    val n = nodes.count()
    var pr = nodes.select($"node", round(lit(1.0) / n, 8).as("pr"))
    for (_ <- 0 until Graph.Iters) {
      pr = e.join(pr, e("src") === pr("node")).join(deg, Seq("src"))
        .select($"dst", ($"pr" / $"outdeg").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("mass"))
        .select($"dst".as("node"),
          round(lit(0.15) / n + lit(Graph.Damping) * $"mass", 8).as("pr"))
    }
    val m = pr.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("h") > m("s1") && m("h") > m("a"))
    assert(m("s1") === m("s2"))
  }

  test("gap fill: spine is dense per user, fill flags and ffill correct") {
    val gf = Advanced.gapFill(spark, sf0001).cache()
    // dense: per user, day count == span length
    val bad = gf.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        (datediff(max($"day"), min($"day")) + 1).as("span"))
      .filter($"n" =!= $"span").count()
    assert(bad === 0)
    // filled rows have zero events and carry a previously-seen value
    assert(gf.filter($"filled" && $"n_events" =!= 0).count() === 0)
    assert(gf.filter(!$"filled" && $"ffill_value".isNull).count() === 0)
    // at least some gaps actually exist in the event data
    assert(gf.filter($"filled").count() > 0)
  }

  test("bfs: seeds at 0, triangle inequality over edges, frontier-only") {
    val dist = Graph.bfsReachability(spark, sf0001).cache()
    val m = dist.as[(String, Int)].collect().toMap
    assert(m.nonEmpty && m.values.min === 0)
    assert(m.values.forall(v => v >= 0 && v <= 4))
    // every edge (a → b) with a reached at dA implies b reached ≤ dA + 1
    val edges = Graph.eventEdges(spark, sf0001)
      .as[(String, String)].collect()
    edges.foreach { case (a, b) =>
      m.get(a).foreach { dA =>
        if (dA < 4)
          assert(m.contains(b) && m(b) <= dA + 1, s"edge $a($dA) -> $b")
      }
    }
    // distances are unique per node (no duplicate reachings)
    assert(dist.groupBy($"node").count().filter($"count" > 1).count() === 0)
  }

  test("connected components: chains, cliques, singletons on a fixture") {
    // a 6-node PATH (worst case for hash-min propagation), a 3-clique,
    // one extra pair, and two isolated nodes from the node universe
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      10L -> 11L, 11L -> 12L, 10L -> 12L,
      20L -> 21L).toDF("src", "dst")
    val nodes = ((1L to 6L) ++ Seq(10L, 11L, 12L, 20L, 21L, 30L, 31L))
      .toDF("node")
    val cc = Graph.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(cc(_) == 1L), s"path collapsed wrong: $cc")
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(cc(20L) == 20L && cc(21L) == 20L)
    assert(cc(30L) == 30L && cc(31L) == 31L) // singletons survive
    assert(cc.size == 13)
  }

  test("connected components: direction/duplicate/self-loop insensitivity") {
    val edges = Seq(2L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 3L, 2L -> 3L)
      .toDF("src", "dst")
    val cc = Graph.connectedComponents((1L to 3L).toDF("node"), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connected components match hash-min propagation on random graphs") {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic CI
    for (trial <- 0 until 8) {
      val n = 10 + rnd.nextInt(40)
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toDF("src", "dst")
      val nodes = (0L until n.toLong).toDF("node")
      val star = Graph.connectedComponents(nodes, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lp = graft.dedup.Dedup.assignCanonical(
        edges.filter($"src" =!= $"dst").toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      star.foreach { case (node, comp) =>
        assert(lp.getOrElse(node, node) == comp,
          s"trial $trial node $node: star=$comp lp=${lp.get(node)}")
      }
      assert(star.size == n, s"trial $trial size")
    }
  }

  test("connected components agree with hash-min label propagation at sf0.001") {
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(spark, sf0001, 0.8)
      .select($"doc_a", $"doc_b").cache()
    val nodes = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 4 === 0).select($"doc_id")
    val star = Graph.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent formulation: Dedup's hash-min propagation (only emits
    // nodes that are in some dup group; singletons default to self)
    val lp = graft.dedup.Dedup.assignCanonical(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.nonEmpty)
    star.foreach { case (n, c) =>
      assert(lp.getOrElse(n, n) == c, s"node $n: star=$c lp=${lp.get(n)}")
    }
  }

  test("label propagation clamps seeds and only spreads seed labels") {
    val lbl = Graph.labelPropagation(spark, sf0001).cache()
    val seedIds = lbl.filter($"node".startsWith("k"))
      .select(expr("CAST(substring(node, 2, 12) AS INT)").as("k"))
      .filter($"k" % 3 === 0)
      .as[Int].collect().toSet
    // every seed node carries its own id
    val seedRows = lbl.filter($"node".startsWith("k") &&
        expr("CAST(substring(node, 2, 12) AS INT) % 3 = 0"))
      .select(expr("CAST(substring(node, 2, 12) AS INT)").as("k"), $"lbl")
      .as[(Int, Option[Int])].collect()
    assert(seedRows.nonEmpty)
    seedRows.foreach { case (k, l) => assert(l.contains(k), s"seed k$k: $l") }
    // non-null labels are always drawn from the seed alphabet
    val foreign = lbl.filter($"lbl".isNotNull)
      .filter(!$"lbl".isin(seedIds.toSeq: _*)).count()
    assert(foreign === 0)
    lbl.unpersist()
  }

  test("shortest paths: zero at sources, bounded by hop count, BFS-consistent reach") {
    val sp = Graph.shortestPaths(spark, sf0001)
      .select($"node", $"dist".as("wdist")).cache()
    val bfs = Graph.bfsReachability(spark, sf0001, rounds = 6)
      .select($"node", $"dist".as("hops")).cache()
    // same seed predicate, every weight ≤ 1 ⇒ identical reachable sets
    assert(sp.count() === bfs.count())
    val matched = sp.join(bfs, Seq("node")).cache()
    assert(matched.count() === sp.count(), "reachable sets differ")
    // weighted distance is bounded by the hop count (w = 1/cnt ≤ 1)
    assert(matched.filter($"wdist" > $"hops" + 1e-9).count() === 0)
    assert(matched.filter($"wdist" < 0).count() === 0)
    // sources (hop 0) sit at distance exactly 0
    assert(matched.filter($"hops" === 0 && $"wdist" =!= 0.0).count() === 0)
    assert(matched.filter($"hops" === 0).count() > 0)
    matched.unpersist(); sp.unpersist(); bfs.unpersist()
  }

  test("adamic-adar matches a driver-side brute force") {
    val got = Graph.adamicAdar(spark, sf0001)
      .as[(Long, Long, Int, Long, Double)].collect()
      .sortBy(r => (r._1, r._3))
    assert(got.length > 0)
    // brute force over collected (user, item) pairs with the same
    // query-set and 9dp term quantization
    val uk = Tables.events(spark, sf0001)
      .select($"user_id", get_json_object($"props", "$.k").cast("int")
        .as("k"))
      .filter($"k".isNotNull)
      .distinct()
      .as[(Long, Int)].collect()
    val deg = uk.groupBy(_._2).map { case (k, v) => k -> v.length }
    val terms = deg.collect { case (k, n) if n >= 2 =>
      k -> (math.rint(1.0 / math.log(n) * 1e9) / 1e9) }
    val queries = uk.map(_._1).distinct.sorted.take(Graph.AaQueries)
    val byUser = uk.groupBy(_._1).map { case (u, v) =>
      u -> v.map(_._2).filter(terms.contains).toSet }
    val want = queries.flatMap { q =>
      val cands = byUser.toSeq.collect {
        case (c, ks) if c != q && (ks & byUser(q)).nonEmpty =>
          val shared = (ks & byUser(q)).toSeq
          (c, shared.map(k => BigDecimal(terms(k))).sum, shared.size.toLong)
      }
      cands.sortBy { case (c, aa, _) => (-aa, c) }.take(5).zipWithIndex
        .map { case ((c, aa, cn), i) => (q, c, i + 1, cn, aa) }
    }.sortBy(r => (r._1, r._3))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((q, c, rk, cn, aa), (wq, wc, wrk, wcn, waa)) =>
      assert((q, c, rk, cn) === (wq, wc, wrk, wcn))
      assert(math.abs(aa - waa.toDouble) < 1e-6)
    }
  }

  test("assortativity matches exact integer moments on collected edges") {
    val r = Graph.assortativity(spark, sf0001).head()
    val edges = Graph.eventEdges(spark, sf0001)
      .as[(String, String)].collect()
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val xy = edges.map { case (s0, d0) => (deg(s0), deg(d0)) }
    val n = BigInt(xy.length)
    val sx = xy.map(p => BigInt(p._1)).sum
    val sy = xy.map(p => BigInt(p._2)).sum
    val sxx = xy.map(p => BigInt(p._1) * p._1).sum
    val syy = xy.map(p => BigInt(p._2) * p._2).sum
    val sxy = xy.map(p => BigInt(p._1) * p._2).sum
    val want = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert(r.getAs[Long]("n_edges") === xy.length.toLong)
    assert(math.abs(r.getAs[Double]("assortativity") -
      math.rint(want * 1e6) / 1e6) < 2e-6)
    // bipartite graphs with heterogeneous degrees are disassortative
    assert(r.getAs[Double]("assortativity") < 0.5)
  }

  test("3-core equals a driver-side sequential peel") {
    val got = Graph.threeCore(spark, sf0001)
      .as[(String, Long)].collect().toMap
    // sequential reference peel on collected edges
    val edges = Graph.eventEdges(spark, sf0001)
      .as[(String, String)].collect()
    var adj = edges.groupBy(_._1).map { case (k, v) =>
      k -> scala.collection.mutable.Set(v.map(_._2): _*) }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (k, v) if v.size < 3 => k }.toSet
      changed = drop.nonEmpty
      adj = adj.collect { case (k, v) if !drop(k) =>
        k -> v.filterNot(drop) }
    }
    val want = adj.map { case (k, v) => k -> v.size.toLong }
    assert(got === want, s"got ${got.size} nodes, want ${want.size}")
    // every member of the 3-core has in-core degree >= 3
    assert(got.values.forall(_ >= 3))
  }

  test("HyperANF round-2 estimates track the exact wedge-join counts") {
    val rows = Graph.hyperAnf(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // HLL at default lgK (12) on neighborhoods this size: every
    // query-set node's estimate stays within 15% of exact(+self),
    // and the mean error is tighter than the worst case
    val errs = rows.map(_.getAs[Double]("rel_err"))
    assert(errs.max <= 0.15, s"max rel_err ${errs.max}")
    assert(errs.sum / errs.length <= 0.05,
      s"mean rel_err ${errs.sum / errs.length}")
  }
}
