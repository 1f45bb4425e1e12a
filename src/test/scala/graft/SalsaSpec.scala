package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.Salsa

/** SALSA chains vs a sequential oracle with the identical two-stage update
  * shape, plus hand-computed steps and the L1-conservation invariant (each
  * chain is a true Markov operator, unlike HITS). */
class SalsaSpec extends SparkTestBase {
  import spark.implicits._

  /** Sequential replay: same contribution/normalize/sum structure. */
  private def oracle(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    val outd = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val ind = edges.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    var auth = ind.keys.map(_ -> 1.0 / ind.size).toMap
    var hub = outd.keys.map(_ -> 1.0 / outd.size).toMap
    (1 to iters).foreach { _ =>
      val hc = edges.groupBy(_._1).map { case (h, es) =>
        h -> es.map { case (_, a) => auth(a) / ind(a) }.sum / outd(h) }
      auth = edges.groupBy(_._2).map { case (a, es) =>
        a -> es.map { case (h, _) => hc(h) }.sum }
      val ac = edges.groupBy(_._2).map { case (a, es) =>
        a -> es.map { case (h, _) => hub(h) / outd(h) }.sum / ind(a) }
      hub = edges.groupBy(_._1).map { case (h, es) =>
        h -> es.map { case (_, a) => ac(a) }.sum }
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> (hub.getOrElse(v, 0.0), auth.getOrElse(v, 0.0))).toMap
  }

  private def collect(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] =
    Salsa.run(spark, edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("one hand-computed authority step") {
    // hubs {1,4}, authorities {2,3}; auth_1 = (0.375 on 2, 0.625 on 3)
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 3L))
    val got = collect(edges, 1)
    assert(math.abs(got(2L)._2 - 0.375) < 1e-12)
    assert(math.abs(got(3L)._2 - 0.625) < 1e-12)
    // hub chain after 1 step: ac(2)=hub(1)/od(1)/id(2)=0.25, ac(3)=(0.25+0.5)/2=0.375
    // hub(1)=ac(2)+ac(3)=0.625, hub(4)=ac(3)=0.375
    assert(math.abs(got(1L)._1 - 0.625) < 1e-12)
    assert(math.abs(got(4L)._1 - 0.375) < 1e-12)
    // pure hub 1,4 have 0 authority; pure authorities 2,3 have 0 hub
    assert(got(1L)._2 == 0.0 && got(4L)._2 == 0.0)
    assert(got(2L)._1 == 0.0 && got(3L)._1 == 0.0)
  }

  test("random graphs: matches the sequential replay; L1 mass conserved") {
    val gen = for {
      n <- Gen.choose(4, 14)
      m <- Gen.choose(n, n * 2)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield es.distinct
    (1 to 8).foreach { i =>
      val edges = gen(Gen.Parameters.default, Seed(400L + i)).get
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val got = collect(edges, 5)
        val want = oracle(edges, 5)
        want.foreach { case (v, (h, a)) =>
          assert(math.abs(got(v)._1 - h) < 1e-9, s"seed $i vertex $v hub")
          assert(math.abs(got(v)._2 - a) < 1e-9, s"seed $i vertex $v authority")
        }
        assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9, s"seed $i hub mass")
        assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9, s"seed $i auth mass")
      }
    }
  }

  test("degenerate: empty edge set yields zero scores, no NaN") {
    val got = collect(Seq.empty[(Long, Long)], 3)
    assert(got.isEmpty)
  }
}
