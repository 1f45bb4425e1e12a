package graft.cluster

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** The heap-based complete-linkage agglomeration must be partition-identical
  * to the straightforward O(E) rescan-per-merge formulation (the round-1
  * implementation, kept here as the oracle) on random weighted graphs. */
class CompleteLinkagePropertySpec extends SparkTestBase {

  /** Reference implementation: full scan for the closest pair per merge. */
  private def scanOracle(dist0: Map[(Long, Long), Double],
                         vertices: Set[Long], threshold: Double): Map[Long, Long] = {
    val dist = mutable.Map.empty[(Long, Long), Double] ++ dist0
    val members = mutable.Map.empty[Long, List[Long]] ++ vertices.map(v => v -> List(v))
    val active = mutable.Set.empty[Long] ++ vertices
    var continue = true
    while (continue && active.size > 1) {
      val best = dist.iterator.filter { case ((a, b), w) =>
        active(a) && active(b) && w <= threshold }
        .reduceOption(Ordering.by[((Long, Long), Double), (Double, Long, Long)] {
          case (k, w) => (w, k._1, k._2) }.min(_, _))
      if (best.isEmpty) continue = false
      else {
        val ((a, b), _) = best.get
        val keep = math.min(a, b); val drop = math.max(a, b)
        active -= drop
        members(keep) = members(keep) ++ members(drop)
        members.remove(drop)
        active.foreach { c =>
          if (c != keep) {
            val k1 = if (keep < c) (keep, c) else (c, keep)
            val k2 = if (drop < c) (drop, c) else (c, drop)
            (dist.get(k1), dist.get(k2)) match {
              case (Some(w1), Some(w2)) => dist(k1) = math.max(w1, w2)
              case (Some(_), None) => dist.remove(k1)
              case (None, Some(_)) => ()
              case _ => ()
            }
            dist.remove(k2)
          }
        }
        dist.remove(if (keep < drop) (keep, drop) else (drop, keep))
      }
    }
    members.toMap.flatMap { case (_, ms) => val l = ms.min; ms.map(_ -> l) }
  }

  private val graphGen: Gen[(List[((Long, Long), Double)], Double)] = for {
    n <- Gen.choose(4, 200)
    m <- Gen.choose(3, 600)
    thr <- Gen.oneOf(0.3, 0.7, Double.MaxValue)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
      w <- Gen.choose(0, 1000)
    } yield ((a.toLong, b.toLong), w / 1000.0))
  } yield (edges.collect { case ((a, b), w) if a != b =>
    (if (a < b) (a, b) else (b, a)) -> w }, thr)

  /** The DuckDB oracle's formulation (SparkEntry "q_complete_linkage"):
    * state is ONLY the partition — pair distance = max base-edge weight
    * between members, pair adjacency = the member biclique condition — and
    * each round merges every locally-minimal mergeable pair (the argmin by
    * (dist, ca, cb) among all mergeable pairs touching either cluster),
    * Borůvka-style, until none remains. Must equal the heap agglomeration
    * exactly; this is the equivalence the SQL twin rests on. */
  private def batchedOracle(edges: Seq[((Long, Long), Double)],
                            threshold: Double): Map[Long, Long] = {
    var asg: Map[Long, Long] =
      edges.flatMap(e => Seq(e._1._1, e._1._2)).distinct.map(v => v -> v).toMap
    var continue = true
    while (continue) {
      val sizes = asg.groupBy(_._2).map { case (c, vs) => c -> vs.size.toLong }
      val byPair = edges.groupBy { case ((s, d), _) =>
        val (ca, cb) = (asg(s), asg(d)); if (ca < cb) (ca, cb) else (cb, ca) }
        .filter { case ((ca, cb), _) => ca != cb }
      val mergeable = byPair.collect {
        case ((ca, cb), es)
          if es.size == sizes(ca) * sizes(cb) && es.map(_._2).max <= threshold =>
            (es.map(_._2).max, ca, cb)
      }.toSeq
      if (mergeable.isEmpty) continue = false
      else {
        val minKey = mutable.Map.empty[Long, (Double, Long, Long)]
        mergeable.foreach { k =>
          Seq(k._2, k._3).foreach { c =>
            if (!minKey.get(c).exists(Ordering.Tuple3[Double, Long, Long].lteq(_, k)))
              minKey(c) = k
          }
        }
        val taken = mergeable.filter(k => minKey(k._2) == k && minKey(k._3) == k)
        val remap = taken.map { case (_, ka, kb) => kb -> ka }.toMap
        asg = asg.map { case (v, c) => v -> remap.getOrElse(c, c) }
      }
    }
    asg
  }

  test("property: batched locally-minimal merges (the SQL oracle model) == heap") {
    val cases = (0 until 40).flatMap(i =>
      graphGen.apply(Gen.Parameters.default, Seed(987654L + i)))
    assert(cases.size >= 30)
    cases.foreach { case (edgesDup, thr) =>
      val dist0 = edgesDup.groupBy(_._1).map { case (k, ws) => k -> ws.map(_._2).min }
      val vertices = dist0.keySet.flatMap(k => Set(k._1, k._2))
      if (vertices.nonEmpty) {
        val got = GreedyClustering.completeLinkageSequential(
          mutable.Map.empty ++ dist0,
          mutable.Map.empty ++ vertices.map(v => v -> List(v)), thr).toMap
        val expect = batchedOracle(dist0.toSeq, thr)
        assert(got == expect, s"thr=$thr |V|=${vertices.size} |E|=${dist0.size}")
      }
    }
  }

  test("property: heap agglomeration == full-scan oracle on random graphs") {
    val cases = (0 until 40).flatMap(i =>
      graphGen.apply(Gen.Parameters.default, Seed(1234L + i)))
    assert(cases.size >= 30)
    cases.foreach { case (edgesDup, thr) =>
      // parallel edges keep min distance, like the distributed wrapper
      val dist0 = edgesDup.groupBy(_._1).map { case (k, ws) => k -> ws.map(_._2).min }
      val vertices = dist0.keySet.flatMap(k => Set(k._1, k._2))
      if (vertices.nonEmpty) {
        val got = GreedyClustering.completeLinkageSequential(
          mutable.Map.empty ++ dist0,
          mutable.Map.empty ++ vertices.map(v => v -> List(v)), thr).toMap
        val expect = scanOracle(dist0, vertices, thr)
        assert(got == expect, s"thr=$thr |V|=${vertices.size} |E|=${dist0.size}")
      }
    }
  }
}
