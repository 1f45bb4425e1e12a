package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.sim.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // clustered vectors: 5 centers, 40 points each, mild noise → real neighbors
  val rnd = new Random(7)
  val dim = 16
  val centers = Array.fill(5, dim)(rnd.nextGaussian())
  val vecs: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
    val c = centers(i % 5)
    i.toLong -> c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq
  }
  lazy val corpus = vecs.toDF("id", "vec")

  def cosScala(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val d = ad.zip(bd).map { case (x, y) => x * y }.sum
    d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  test("brute-force top-k matches plain-Scala oracle") {
    val queries = vecs.take(3).toDF("qid", "qvec")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    vecs.take(3).foreach { case (qid, qv) =>
      val expect = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, cosScala(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      expect.zipWithIndex.foreach { case (id, i) =>
        assert(got((qid, i + 1)) == id, s"query $qid rank ${i + 1}")
      }
    }
  }

  test("LSH top-k recall >= 0.9 vs brute force at default (64-bit, 8x8) params") {
    // intra-cluster cosine ≈ 0.95 here, i.e. near-dup grade: per the recall
    // calculus in Similarity.lshTopK, 8 bands of 8 bits give ~0.99 expected
    // recall while a random cross-cluster pair collides with ~3%
    val queries = vecs.take(10).toDF("qid", "qvec")
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val lsh = Similarity.lshTopK(corpus, queries, k = 10, dim = dim)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = brute.keys.toSeq.map { q =>
      val l = lsh.getOrElse(q, Set.empty)
      l.intersect(brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 = $mean")
  }

  test("native RHP signature is bit-identical to the HOF formulation") {
    val diff = corpus.select(
        Similarity.rhpSignature($"vec", nBits = 64, dim = dim).as("a"),
        Similarity.rhpSignatureHof($"vec", nBits = 64, dim = dim).as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0L)
    // dim mismatch: both formulations degrade to the all-zero signature
    val zeros = corpus.select(
        Similarity.rhpSignature($"vec", nBits = 8, dim = dim + 1).as("a"),
        Similarity.rhpSignatureHof($"vec", nBits = 8, dim = dim + 1).as("b"))
      .collect()
    assert(zeros.forall(r => r.getLong(0) == 0L && r.getLong(1) == 0L))
  }

  test("dimension mismatch fails fast instead of silently zeroing signatures") {
    val queries = vecs.take(2).toDF("qid", "qvec")
    val ex = intercept[IllegalArgumentException] {
      Similarity.lshTopK(corpus, queries, k = 5, dim = dim + 1).collect()
    }
    assert(ex.getMessage.contains("!= configured dim"))
  }

  test("embedding near-dup pairs finds planted duplicates") {
    val planted = corpus.unionByName(
      Seq((1000L, vecs.head._2.map(v => v * 1.0001f))).toDF("id", "vec"))
    val pairs = Similarity.nearDupPairs(planted, threshold = 0.999, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1000L)), s"got $pairs")
  }

  test("maxBucket cap drops degenerate buckets instead of exploding the join") {
    val planted = corpus.unionByName(
      Seq((1000L, vecs.head._2.map(v => v * 1.0001f))).toDF("id", "vec"))
    // with the cap at 1 every bucket containing a colliding pair is dropped
    val capped = Similarity.nearDupPairs(planted, threshold = 0.999, maxBucket = 1, dim = dim)
    assert(capped.count() == 0L)
  }

  test("maxBucket cap is SELECTIVE: a planted mega-bucket is dropped, pairs in healthy buckets keep recall 1.0") {
    // 60 identical vectors = one degenerate direction whose (band, bucket)
    // entries number 60 in EVERY band — over the cap of 20, so the cap must
    // drop all of them (the quadratic 60×60 candidate block) — while 5
    // planted near-dup pairs along other directions live in buckets of ~2
    // and must ALL survive. This is the documented cap contract: capping
    // sacrifices only pairs inside over-cap buckets, never the rest.
    val hotDir = Array.fill(dim)(rnd.nextGaussian())
    val hot = (0 until 60).map(i => (2000L + i) -> hotDir.map(_.toFloat).toSeq)
    val pairDirs = Array.fill(5, dim)(rnd.nextGaussian())
    val pairs = (0 until 5).flatMap { i =>
      Seq((3000L + i) -> pairDirs(i).map(_.toFloat).toSeq,
          (3100L + i) -> pairDirs(i).map(x => (x * 1.0001).toFloat).toSeq)
    }
    val all = hot ++ pairs
    val df = all.toDF("id", "vec")

    def collectPairs(maxBucket: Int): Set[(Long, Long)] =
      Similarity.nearDupPairs(df, threshold = 0.999, maxBucket = maxBucket, dim = dim)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val uncapped = collectPairs(maxBucket = 1000000)
    val capped = collectPairs(maxBucket = 20)

    val brute = (for {
      (a, va) <- all; (b, vb) <- all if a < b
      if cosScala(va, vb) >= 0.999
    } yield (a, b)).toSet
    val hotHot = brute.filter { case (a, b) => a >= 2000L && a < 3000L && b < 3000L }
    val planted = (0 until 5).map(i => (3000L + i, 3100L + i)).toSet

    // soundness both ways: LSH verifies candidates exactly, so output ⊆ brute
    assert(uncapped.subsetOf(brute) && capped.subsetOf(brute))
    // the mega-bucket really is degenerate and really was dropped
    assert(hotHot.size == 60 * 59 / 2)
    assert(uncapped.intersect(hotHot) == hotHot, "uncapped run must see the hot block")
    assert(capped.intersect(hotHot).isEmpty, "cap failed to drop the mega-bucket")
    // recall floor on healthy buckets: every planted pair survives the cap
    assert(planted.subsetOf(capped),
      s"cap dropped above-threshold pairs outside the mega-bucket: missing ${planted -- capped}")
    // and capping lost NOTHING except hot-bucket pairs
    assert(capped == uncapped -- hotHot,
      "cap dropped pairs from buckets that were under the cap")
  }
}
