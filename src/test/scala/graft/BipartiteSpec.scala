package graft

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.Bipartite

/** BFS-parity bipartiteness vs hand cases and an INDEPENDENT 2-coloring
  * oracle (proper-coloring attempt, not a parity replay) — the bipartite
  * verdict must agree with graph theory, and the conflict counts with the
  * deterministic min-root parity definition. */
class BipartiteSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long, Long)] =
    Bipartite.check(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  /** Independent verdict: try to properly 2-color via BFS; conflict-free
    * coloring exists iff bipartite (no parity bookkeeping shared with the
    * implementation). */
  private def isBipartite(edges: Seq[(Long, Long)]): Map[Long, Boolean] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    val verts = mutable.SortedSet.empty[Long]
    edges.foreach { case (a, b) =>
      verts += a; verts += b
      if (a != b) {
        adj.getOrElseUpdate(a, mutable.Set.empty) += b
        adj.getOrElseUpdate(b, mutable.Set.empty) += a
      }
    }
    val color = mutable.Map.empty[Long, Int]
    val compOf = mutable.Map.empty[Long, Long]
    val ok = mutable.Map.empty[Long, Boolean]
    verts.foreach { s =>
      if (!color.contains(s)) {
        color(s) = 0; compOf(s) = s
        var good = true
        var frontier = List(s)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap { v =>
            adj.getOrElse(v, Set.empty).toList.flatMap { u =>
              if (!color.contains(u)) { color(u) = 1 - color(v); compOf(u) = s; Some(u) }
              else { if (color(u) == color(v)) good = false; None }
            }
          }
        }
        ok(s) = good
      }
    }
    // self-loops break their component
    edges.filter(e => e._1 == e._2).foreach(e => ok(compOf(e._1)) = false)
    verts.map(v => v -> ok(compOf(v))).toMap.filter { case (v, _) => compOf(v) == v }
  }

  test("even cycle is bipartite; odd cycle is not, with the witness edge counted") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), // 4-cycle
      (10L, 11L), (11L, 12L), (12L, 10L)) // triangle
    val got = run(g)
    assert(got(1L) == ((4L, 4L, 0L, 1L)))
    // triangle rooted at 10: parities 0,1,1 -> edge (11,12) is the one witness
    assert(got(10L) == ((3L, 3L, 1L, 0L)))
  }

  test("star is bipartite; self-loop component is not (odd 1-cycle)") {
    val g = (1L to 5L).map(i => (0L, i)) ++ Seq((9L, 9L))
    val got = run(g)
    assert(got(0L) == ((6L, 5L, 0L, 1L)))
    assert(got(9L) == ((1L, 1L, 1L, 0L)))
  }

  test("random graphs: verdicts match the independent 2-coloring oracle") {
    val gen = for {
      n <- Gen.choose(4, 16)
      m <- Gen.choose(2, n * 2)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield es.distinct
    (1 to 10).foreach { i =>
      val edges = gen(Gen.Parameters.default, Seed(700L + i)).get
      if (edges.nonEmpty) {
        val got = run(edges)
        val want = isBipartite(edges)
        assert(got.keySet == want.keySet, s"seed $i components")
        want.foreach { case (comp, bip) =>
          assert((got(comp)._4 == 1L) == bip, s"seed $i component $comp verdict")
          assert((got(comp)._3 == 0L) == bip, s"seed $i component $comp conflict count vs verdict")
        }
        // edge totals partition the edge set
        val undirected = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
        assert(got.values.map(_._2).sum == undirected.size.toLong, s"seed $i edge total")
      }
    }
  }

  test("round cap throws instead of returning a silently partial coloring") {
    // a path of radius 5 with maxIter = 2: the BFS cannot settle every
    // vertex, and the old code would report the component bipartite on
    // whatever parity rows existed (round-5 ADVICE) — now it must throw
    val path = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    val ex = intercept[IllegalStateException] {
      graft.graph.Bipartite.check(spark, path.toDF("src", "dst"), maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not settle"))
  }
}
