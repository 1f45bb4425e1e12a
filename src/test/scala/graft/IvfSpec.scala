package graft

import scala.util.Random

import graft.sim.{Ivf, Similarity}

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  // clustered vectors: 4 well-separated centers, 50 points each, mild noise
  val rnd = new Random(11)
  val dim = 16
  val centers = Array.fill(4, dim)(rnd.nextGaussian() * 3.0)
  val vecs: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
    val c = centers(i % 4)
    i.toLong -> c.map(x => (x + 0.2 * rnd.nextGaussian()).toFloat).toSeq
  }
  lazy val corpus = vecs.toDF("id", "vec")

  test("k-means cells recover the planted clusters (majority purity)") {
    val model = Ivf.train(corpus, nlist = 4, iters = 5)
    val got = Ivf.cells(corpus, model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // purity: within each planted cluster, the modal cell holds >= 90%
    (0 until 4).foreach { g =>
      val cells = (0 until 200).filter(_ % 4 == g).map(i => got(i.toLong))
      val modal = cells.groupBy(identity).values.map(_.size).max
      assert(modal >= (cells.size * 0.9).toInt, s"cluster $g split across cells")
    }
  }

  test("deterministic training: same data, same model") {
    val m1 = Ivf.train(corpus, nlist = 4, iters = 3)
    val m2 = Ivf.train(corpus, nlist = 4, iters = 3)
    assert(m1.centroids.map(_._1) == m2.centroids.map(_._1))
    m1.centroids.zip(m2.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b))
    }
  }

  test("IVF search at nprobe=1 on clustered data: recall >= 0.9 vs brute force") {
    // neighbors of a clustered query live in its own cell, so probing one
    // cell of four reads ~25% of the corpus and still recovers the top-k
    val model = Ivf.train(corpus, nlist = 4, iters = 5)
    val queries = vecs.take(8).toDF("qid", "qvec")
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val ivf = Ivf.search(corpus, queries, model, k = 10, nprobe = 1)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = brute.keys.toSeq.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 = $mean")
  }

  test("native nearest-cell kernel == literal least() chain at nlist=256") {
    // a 256-cell model would blow the literal expression chain's codegen at
    // production dims — here it is small enough to evaluate both paths and
    // assert bit-identical assignments (incl. tie-breaks to the lower cell)
    val bigRnd = new Random(7)
    val wide: Seq[(Long, Seq[Float])] = (0 until 600).map { i =>
      i.toLong -> Seq.fill(dim)((bigRnd.nextGaussian() * 2).toFloat)
    }
    val wideDf = wide.toDF("id", "vec")
    val model = Ivf.Model((0 until 256).map { c =>
      c -> wide(c)._2.map(_.toDouble).toArray
    }.toVector)
    val native = Ivf.cells(wideDf, model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val literal = Ivf.cellsLiteral(wideDf, model).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == literal)
    // exact-duplicate vectors force distance ties across cells: the first
    // 256 corpus rows ARE the centroids, so row c must land in cell c
    (0 until 256).foreach(c => assert(native(c.toLong) == c.toLong))
  }

  test("probing all cells reproduces exact brute-force top-k") {
    val model = Ivf.train(corpus, nlist = 4, iters = 5)
    val queries = vecs.take(3).toDF("qid", "qvec")
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val ivf = Ivf.search(corpus, queries, model, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(ivf == brute)
  }
}
