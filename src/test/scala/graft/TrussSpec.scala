package graft

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.Truss

/** k-truss peeling vs an exact sequential oracle, on hand-built and
  * scalacheck-random graphs. */
class TrussSpec extends SparkTestBase {
  import spark.implicits._

  /** Exact sequential truss oracle: peel edges with support < k-2 until
    * stable; returns surviving canonical edges with fixpoint support. */
  private def trussOracle(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    var es = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct.toSet
    def adj: Map[Long, Set[Long]] = {
      val m = mutable.Map.empty[Long, mutable.Set[Long]]
      es.foreach { case (a, b) =>
        m.getOrElseUpdate(a, mutable.Set.empty) += b
        m.getOrElseUpdate(b, mutable.Set.empty) += a
      }
      m.map { case (v, s) => v -> s.toSet }.toMap
    }
    var changed = true
    var support = Map.empty[(Long, Long), Long]
    while (changed) {
      val a = adj
      support = es.iterator.map { case (x, y) =>
        (x, y) -> (a(x) & a(y)).size.toLong
      }.toMap
      val keep = es.filter(e => support(e) >= k - 2)
      changed = keep != es
      es = keep
    }
    support.filter { case (e, _) => es.contains(e) }
  }

  private def sparkTruss(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] =
    Truss.truss(spark, edges.toDF("src", "dst"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("triangle with a pendant: 3-truss drops the pendant edge") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(sparkTruss(edges, 3) ==
      Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("peeling cascades: breaking one triangle can unravel a chain of them") {
    // bowtie of two triangles sharing vertex 3, plus a 4-clique
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L),
      (6L, 7L), (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L), (8L, 9L))
    // 4-truss (support >= 2): both bowtie triangles die (each edge has
    // exactly one supporting triangle), the 4-clique survives with sup 2
    val t4 = sparkTruss(edges, 4)
    assert(t4.keySet == Set((6L, 7L), (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L), (8L, 9L)))
    assert(t4.values.forall(_ == 2L))
    // 3-truss keeps everything (every edge closes >= 1 triangle)
    assert(sparkTruss(edges, 3).keySet.size == 12)
  }

  test("empty and triangle-free graphs yield empty trusses") {
    assert(sparkTruss(Seq.empty, 3).isEmpty)
    val path = (1L to 5L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(sparkTruss(path, 3).isEmpty)
  }

  test("random graphs match the sequential oracle (k = 3 and 4)") {
    val gen = for {
      n <- Gen.choose(4, 14)
      m <- Gen.choose(n, n * 3)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield es
    (1 to 12).foreach { i =>
      val edges = gen(Gen.Parameters.default, Seed(i.toLong)).get
        .filter { case (a, b) => a != b }
      Seq(3, 4).foreach { k =>
        assert(sparkTruss(edges, k) == trussOracle(edges, k),
          s"seed $i k=$k edges=$edges")
      }
    }
  }
}
