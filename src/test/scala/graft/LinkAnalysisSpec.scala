package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.{LinkPrediction, ShortestPaths, TriangleCount}

/** Link-prediction / clustering-coefficient / multi-source-BFS vs
  * brute-force sequential oracles on hand-built and random graphs. */
class LinkAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  private val genEdges = for {
    n <- Gen.choose(6, 25)
    m <- Gen.choose(6, 70)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
    } yield (a.toLong, b.toLong))
  } yield es.filter { case (a, b) => a != b }

  private def adjOf(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }

  test("resource allocation matches brute force (capped middles, non-adjacent, >=2 common)") {
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (1L, 5L), (4L, 5L),
      (6L, 2L), (6L, 3L), (2L, 3L)) // 1,4,6 share middles {2,3}; 1,4 also share 5
    val adj = adjOf(edges)
    val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
    val vs = adj.keySet.toSeq.sorted
    val brute = (for {
      a <- vs; b <- vs if a < b && !adj(a).contains(b)
      common = (adj(a) & adj(b)).filter(z => deg(z) <= 64)
      if common.size >= 2
    } yield (a, b) -> (common.size.toLong,
      common.toSeq.map(z => 1.0 / deg(z)).sum)).toMap
    val got = LinkPrediction.resourceAllocation(spark, edges.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (k, (c, ra)) =>
      assert(c == brute(k)._1, s"common$k")
      assert(math.abs(ra - brute(k)._2) < 1e-6, s"ra$k")
    }
  }

  test("middle-degree cap excludes hub middles from both pairs and scores") {
    // star hub 100 connects 1..5; middle 100 has degree 5; with cap 3 the
    // only wedges come from low-degree middles — here none, so no pairs
    val star = (1L to 5L).map(i => (100L, i))
    val none = LinkPrediction.resourceAllocation(spark, star.toDF("src", "dst"),
      maxMiddleDegree = 3)
    assert(none.count() == 0L)
    // with the cap >= 5 the hub qualifies: C(5,2) = 10 pairs, ra = 1/5
    val all = LinkPrediction.resourceAllocation(spark, star.toDF("src", "dst"),
      maxMiddleDegree = 5, minCommon = 1).collect()
    assert(all.length == 10)
    all.foreach(r => assert(math.abs(r.getDouble(3) - 0.2) < 1e-9))
  }

  test("property: resource allocation equals brute force on random graphs") {
    (0 until 3).foreach { i =>
      val edges = genEdges.apply(Gen.Parameters.default, Seed(33L + i)).get
      val adj = adjOf(edges)
      if (adj.nonEmpty) {
        val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
        val vs = adj.keySet.toSeq.sorted
        val brute = (for {
          a <- vs; b <- vs if a < b && !adj(a).contains(b)
          common = (adj(a) & adj(b)).filter(z => deg(z) <= 8)
          if common.size >= 2
        } yield (a, b) -> common.size.toLong).toMap
        val got = LinkPrediction.resourceAllocation(spark, edges.toDF("src", "dst"),
            maxMiddleDegree = 8)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got == brute, s"seed=${33 + i}")
      }
    }
  }

  test("local clustering coefficient matches brute force") {
    (0 until 3).foreach { i =>
      val edges = genEdges.apply(Gen.Parameters.default, Seed(41L + i)).get
      val adj = adjOf(edges)
      if (adj.nonEmpty) {
        val brute = adj.map { case (v, ns) =>
          val d = ns.size
          val links = ns.toSeq.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }
          v -> (if (d >= 2) 2.0 * links / (d.toLong * (d - 1)) else 0.0)
        }
        val got = TriangleCount.localClusteringCoefficient(spark, edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
        assert(got.keySet == brute.keySet, s"seed=${41 + i}")
        got.foreach { case (v, l) =>
          assert(math.abs(l - brute(v)) < 1e-6, s"seed=${41 + i} lcc($v)") }
      }
    }
  }

  test("assortativity: star graph is perfectly disassortative; brute parity on random") {
    val star = (1L to 5L).map(i => (100L, i))
    val r = graft.graph.GraphStats.assortativity(spark, star.toDF("src", "dst"))
      .head().getDouble(0)
    assert(math.abs(r - (-1.0)) < 1e-9)

    (0 until 3).foreach { i =>
      val edges = genEdges.apply(Gen.Parameters.default, Seed(61L + i)).get
      val adj = adjOf(edges)
      if (adj.nonEmpty) {
        val deg = adj.map { case (v, ns) => v -> ns.size.toDouble }
        val ends = adj.toSeq.flatMap { case (u, ns) => ns.toSeq.map(v => (deg(u), deg(v))) }
        val m2 = ends.size.toDouble
        val sxy = ends.map { case (x, y) => x * y }.sum
        val sx = ends.map(_._1).sum
        val sxx = ends.map { case (x, _) => x * x }.sum
        val den = sxx / m2 - (sx / m2) * (sx / m2)
        if (den != 0.0) {
          val want = (sxy / m2 - (sx / m2) * (sx / m2)) / den
          val got = graft.graph.GraphStats.assortativity(spark, edges.toDF("src", "dst"))
            .head().getDouble(0)
          assert(math.abs(got - want) < 1e-6, s"seed=${61 + i}")
        }
      }
    }
  }

  test("harmonic centrality from landmarks matches brute BFS fold") {
    val edges = genEdges.apply(Gen.Parameters.default, Seed(71L)).get
    val adj = adjOf(edges)
    val landmarks = adj.keySet.toSeq.sorted.take(4)
    def bfs(s: Long): Map[Long, Long] = {
      var dist = Map(s -> 0L); var frontier = Set(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj).diff(dist.keySet)
        val d = dist(frontier.head) + 1
        dist ++= next.map(_ -> d); frontier = next
      }
      dist
    }
    val per = landmarks.map(s => s -> bfs(s)).toMap
    val brute = adj.keySet.toSeq.map { v =>
      v -> landmarks.flatMap(s => per(s).get(v)).filter(_ > 0).map(1.0 / _).sum
    }.filter(_._2 > 0).toMap
    val got = graft.graph.GraphStats.harmonicFromLandmarks(
        spark, edges.toDF("src", "dst"), landmarks)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == brute.keySet)
    got.foreach { case (v, h) => assert(math.abs(h - brute(v)) < 1e-6, s"h($v)") }
  }

  test("multi-source BFS equals per-source single BFS") {
    val edges = genEdges.apply(Gen.Parameters.default, Seed(55L)).get
    val adj = adjOf(edges)
    val sources = adj.keySet.toSeq.sorted.take(3)
    val multi = ShortestPaths.multiHops(spark, edges.toDF("src", "dst"), sources)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    sources.foreach { s =>
      val single = ShortestPaths.hops(spark, edges.toDF("src", "dst"), s)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val mine = multi.collect { case ((src, v), d) if src == s => v -> d }
      assert(mine == single, s"source $s")
    }
  }
}
