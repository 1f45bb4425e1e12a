package graft

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.KCore

/** k-core vs an exact sequential peeling oracle, on hand-built and
  * scalacheck-random graphs. */
class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def peelOracle(edges: Seq[(Long, Long)], k: Int): Set[Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, mutable.Set.empty) += b
        adj.getOrElseUpdate(b, mutable.Set.empty) += a
      }
    }
    var changed = true
    while (changed) {
      changed = false
      adj.keys.toSeq.foreach { v =>
        if (adj(v).size < k) {
          adj(v).foreach(u => adj(u) -= v)
          adj.remove(v)
          changed = true
        }
      }
    }
    adj.keySet.toSet
  }

  private def sparkCore(edges: Seq[(Long, Long)], k: Int): Set[Long] =
    KCore.coreVertices(spark, edges.toDF("src", "dst"), k)
      .collect().map(_.getLong(0)).toSet

  test("triangle plus tail: 2-core is the triangle") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(sparkCore(edges, 2) == Set(1L, 2L, 3L))
    assert(sparkCore(edges, 1) == Set(1L, 2L, 3L, 4L, 5L))
    assert(sparkCore(edges, 3) == Set.empty)
  }

  test("peeling cascades: removing a leaf can unravel a chain") {
    // path graph: 2-core empty even though interior vertices start at deg 2
    val path = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(sparkCore(path, 2) == Set.empty)
  }

  /** Exact sequential core-number oracle: repeatedly peel min-degree. */
  private def coreNumberOracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, mutable.Set.empty) += b
        adj.getOrElseUpdate(b, mutable.Set.empty) += a
      }
    }
    val core = mutable.Map.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val minDeg = adj.valuesIterator.map(_.size.toLong).min
      k = math.max(k, minDeg)
      // peel at this k until stable (removals cascade below k)
      var peel = adj.collect { case (v, ns) if ns.size <= k => v }.toSeq
      while (peel.nonEmpty) {
        peel.foreach { v =>
          core(v) = k
          adj(v).foreach(u => adj.get(u).foreach(_ -= v))
          adj.remove(v)
        }
        peel = adj.collect { case (v, ns) if ns.size <= k => v }.toSeq
      }
    }
    core.toMap
  }

  private def sparkDecomp(edges: Seq[(Long, Long)]): Map[Long, Long] =
    KCore.run(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("decomposition: triangle plus tail core numbers") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(sparkDecomp(edges) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("property: decomposition equals sequential peeling core numbers; " +
    "coreVertices(k) == {v : core(v) >= k}") {
    val gen = for {
      n <- Gen.choose(6, 30)
      m <- Gen.choose(6, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.filter { case (a, b) => a != b }
    (0 until 3).foreach { i =>
      val edges = gen.apply(Gen.Parameters.default, Seed(21L + i)).get
      val got = sparkDecomp(edges)
      assert(got == coreNumberOracle(edges), s"seed=${21 + i}")
      // cross-operator consistency with the single-k extraction
      assert(got.filter(_._2 >= 2L).keySet == sparkCore(edges, 2),
        s"seed=${21 + i} k=2 membership")
    }
  }

  test("property: k-core equals sequential peeling oracle on random graphs") {
    val gen = for {
      n <- Gen.choose(6, 30)
      m <- Gen.choose(6, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.filter { case (a, b) => a != b }
    (0 until 3).foreach { i =>
      val edges = gen.apply(Gen.Parameters.default, Seed(7L + i)).get
      Seq(2, 3).foreach { k =>
        assert(sparkCore(edges, k) == peelOracle(edges, k), s"seed=${7 + i} k=$k")
      }
    }
  }
}
