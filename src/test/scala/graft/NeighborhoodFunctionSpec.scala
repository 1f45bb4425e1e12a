package graft

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.NeighborhoodFunction

/** KMV reach sketches vs an exact sequential BFS-ball oracle: the sketch
  * propagation must land on exactly the k smallest hashes of the exact
  * h-hop ball (the estimate is then a pure function of the sketch). */
class NeighborhoodFunctionSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hash60(v: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def ball(edges: Seq[(Long, Long)], s: Long, h: Int): Set[Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, mutable.Set.empty) += b
        adj.getOrElseUpdate(b, mutable.Set.empty) += a
      }
    }
    var frontier = Set(s); var seen = Set(s)
    (1 to h).foreach { _ =>
      frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
      seen ++= frontier
    }
    seen
  }

  private def oracleRow(edges: Seq[(Long, Long)], s: Long, h: Int, k: Int): (Long, Double) = {
    val hashes = ball(edges, s, h).toSeq.map(md5hash60).sorted
    val n = hashes.size
    if (n < k) (n.toLong, n.toDouble)
    else (k.toLong,
      BigDecimal((k - 1).toDouble * math.pow(2.0, 60) / hashes(k - 1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("path graph, small k: sketch is the exact ball below k") {
    val path = (1L to 8L).sliding(2).map(s => (s(0), s(1))).toSeq
    val rows = NeighborhoodFunction.kmvReach(spark, path.toDF("src", "dst"), hops = 2, k = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // interior vertex 4 reaches {2,3,4,5,6} in 2 hops
    assert(rows(4L) == ((5L, 5.0)))
    // endpoint 1 reaches {1,2,3}
    assert(rows(1L) == ((3L, 3.0)))
  }

  test("sketch saturates at k and the estimate uses the kth order statistic") {
    // star: center 0 linked to 1..20; 1-hop ball of the center is 21 > k
    val star = (1L to 20L).map(i => (0L, i))
    val k = 8
    val rows = NeighborhoodFunction.kmvReach(spark, star.toDF("src", "dst"), hops = 1, k = k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (n0, est0) = oracleRow(star, 0L, 1, k)
    assert(rows(0L)._1 == n0 && n0 == k.toLong)
    assert(math.abs(rows(0L)._2 - est0) < 1e-9, s"got ${rows(0L)._2}, want $est0")
    // leaves see {0, leaf} only
    assert(rows(7L) == ((2L, 2.0)))
  }

  test("reach curve: per-hop totals are the exact decimal sums of the per-vertex oracle") {
    // two components: a 6-path and a triangle — the curve must count both
    val edges = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq ++
      Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val k = 4 // small k so the path saturates some sketches
    val got = graft.graph.NeighborhoodFunction.reachCurve(spark, edges.toDF("src", "dst"), 3, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val oracle = (1 to 3).map { h =>
      val per = verts.map(v => oracleRow(edges, v, h, k))
      val nSat = per.count(_._1 == k.toLong)
      val total = per.map(p => BigDecimal(p._2).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      (h.toLong, verts.size.toLong, nSat.toLong, total)
    }
    val totalMax = oracle.last._4.toDouble
    got.zip(oracle).foreach { case ((hop, nv, nsat, tot, avg, frac), (oh, onv, onsat, ototal)) =>
      assert(hop == oh && nv == onv && nsat == onsat)
      assert(tot == ototal.toDouble, s"hop $hop total")
      val wantAvg = BigDecimal(ototal.toDouble / onv).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val wantFrac = BigDecimal(ototal.toDouble / totalMax).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(avg == wantAvg, s"hop $hop avg")
      assert(frac == wantFrac, s"hop $hop frac")
    }
    assert(got.last._6 == 1.0)
  }

  test("random graphs: sketch_n and estimate match the exact-ball oracle") {
    val gen = for {
      n <- Gen.choose(5, 18)
      m <- Gen.choose(n, n * 2)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(1L, n.toLong); b <- Gen.choose(1L, n.toLong)
      } yield (a, b))
    } yield es
    (1 to 10).foreach { i =>
      val edges = gen(Gen.Parameters.default, Seed(100L + i)).get
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val k = 6
        val rows = NeighborhoodFunction.kmvReach(spark, edges.toDF("src", "dst"), hops = 3, k = k)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
        verts.foreach { v =>
          val (n, est) = oracleRow(edges, v, 3, k)
          assert(rows(v)._1 == n, s"seed $i vertex $v sketch_n")
          assert(math.abs(rows(v)._2 - est) < 1e-6, s"seed $i vertex $v est")
        }
      }
    }
  }

  test("planted mega-hub: bounded union matches the unsalted reference formulation") {
    // one vertex with degree >> everything (the SimilaritySpec maxBucket
    // pattern): the hub's merge previously accumulated Θ(degree·k) longs in
    // one aggregation buffer; KmvUnionAgg caps it at k. Output must be
    // IDENTICAL to the unbounded flatten(collect_list)-then-slice form.
    import org.apache.spark.sql.functions._
    val hubDeg = 3000
    val edges = (1L to hubDeg.toLong).map(i => (0L, i)) ++ // the hub
      Seq((1L, 2L), (2L, 3L), (5001L, 5002L)) // some off-hub structure
    val k = 16
    val df = edges.toDF("src", "dst")
    val got = NeighborhoodFunction.kmvReach(spark, df, hops = 2, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)

    // unsalted reference twin, inlined (the pre-round-6 formulation)
    val e0 = df.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val bi = e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .localCheckpoint(true) // break lineage so state⋈bi is not an ambiguous self-join
    def vhash(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    var state = bi.select(col("src").as("v")).distinct()
      .select(col("v"), array(vhash(col("v"))).as("sk"))
      .localCheckpoint(true) // fresh attributes, like the real sketchLoop's state
    (1 to 2).foreach { _ =>
      val msgs = state.join(bi, state("v") === bi("src")).select(bi("dst").as("v"), col("sk"))
      state = state.unionByName(msgs).groupBy("v")
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, k).as("sk"))
        .localCheckpoint(true) // per-hop lineage break, like the real sketchLoop
    }
    val want = state.select(col("v"),
        size(col("sk")).cast("long").as("n"),
        round(when(size(col("sk")) < k, size(col("sk")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) / element_at(col("sk"), k)), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // hub saturates: 2-hop ball of vertex 0 is the whole star component
    assert(got.find(_._1 == 0L).get._2 == k.toLong)
  }

  test("KmvUnionAgg: buffer never exceeds k and equals sorted-distinct-take-k") {
    val k = 8
    val agg = new graft.functions.KmvUnionAgg(k)
    val rnd = new scala.util.Random(7)
    // stream 100k arrays through reduce, tracking the max buffer size ever
    var buf = agg.zero
    var maxLen = 0
    val all = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to 100000).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong().abs % 10000)
      all ++= xs
      buf = agg.reduce(buf, xs)
      maxLen = math.max(maxLen, buf.length)
    }
    assert(maxLen <= k, s"buffer grew to $maxLen > k=$k")
    assert(buf == all.distinct.sorted.take(k).toSeq)
    // merge is associative and also bounded
    val parts = all.grouped(1000).map(g =>
      g.foldLeft(agg.zero)((b, x) => agg.reduce(b, Seq(x)))).toSeq
    val merged = parts.foldLeft(agg.zero)(agg.merge)
    assert(merged == all.distinct.sorted.take(k).toSeq)
    assert(parts.forall(_.length <= k))
  }
}
