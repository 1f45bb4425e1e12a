package graft

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.StronglyConnectedComponents

/** Iterated F/B-min-label SCC vs an independent Tarjan oracle. */
class SccSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    StronglyConnectedComponents.run(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Iterative Tarjan, components labeled by their min member. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    val verts = mutable.SortedSet.empty[Long]
    edges.foreach { case (a, b) =>
      verts += a; verts += b
      if (a != b) adj(a) = b :: adj(a)
    }
    val index = mutable.Map.empty[Long, Int]
    val low = mutable.Map.empty[Long, Int]
    val onStack = mutable.Set.empty[Long]
    val stack = mutable.Stack.empty[Long]
    val out = mutable.Map.empty[Long, Long]
    var counter = 0
    def strongconnect(v0: Long): Unit = {
      // explicit work stack: (vertex, remaining-neighbors)
      var work = List((v0, adj(v0)))
      index(v0) = counter; low(v0) = counter; counter += 1
      stack.push(v0); onStack += v0
      while (work.nonEmpty) {
        val (v, ns) = work.head
        ns match {
          case w :: rest =>
            work = (v, rest) :: work.tail
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack.push(w); onStack += w
              work = (w, adj(w)) :: work
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          case Nil =>
            work = work.tail
            work.headOption.foreach { case (p, _) => low(p) = math.min(low(p), low(v)) }
            if (low(v) == index(v)) {
              val comp = mutable.Buffer.empty[Long]
              var w = 0L
              while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
              val lbl = comp.min
              comp.foreach(u => out(u) = lbl)
            }
        }
      }
    }
    verts.foreach(v => if (!index.contains(v)) strongconnect(v))
    out.toMap
  }

  test("cycle with a tail: the cycle is one SCC, the tail a singleton") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("two cycles bridged one-way stay separate SCCs") {
    val got = run(Seq((1L, 2L), (2L, 1L), (2L, 10L), (10L, 11L), (11L, 10L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("DAG: every vertex is its own SCC") {
    val got = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("self-loop-only vertex is a singleton SCC, not dropped") {
    val got = run(Seq((1L, 2L), (9L, 9L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 9L -> 9L))
  }

  test("monotone chain longer than the outer-round cap resolves via trim") {
    // 1 -> 2 -> ... -> 70: a pure DAG chain. Pre-trim, each FW-BW outer
    // round resolved exactly one vertex (min-ancestor = min-descendant only
    // at the chain head), so 70 vertices blew the 64-round cap and threw.
    // The degree-trim phase peels both chain ends each pass and resolves the
    // whole graph without a single FW-BW round (round-5 VERDICT #6).
    val chain = (1L to 70L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(chain)
    assert(got == (1L to 70L).map(v => v -> v).toMap)
  }

  test("trim does not break mixed topology: chain feeding a cycle") {
    // tendril 1->2->3 into cycle 3->4->5->3, plus out-tendril 5->9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 3L), (5L, 9L))
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 3L, 9L -> 9L))
  }

  test("random digraphs: matches Tarjan") {
    val gen = for {
      n <- Gen.choose(4, 16)
      m <- Gen.choose(n, n * 3)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield es.distinct
    (1 to 10).foreach { i =>
      val edges = gen(Gen.Parameters.default, Seed(900L + i)).get
      if (edges.nonEmpty) {
        val got = run(edges)
        val want = tarjan(edges)
        assert(got == want, s"seed $i")
      }
    }
  }
}
