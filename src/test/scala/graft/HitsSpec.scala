package graft

import graft.graph.Hits

/** HITS vs a plain-Scala power-iteration oracle (allclose 1e-6). */
class HitsSpec extends SparkTestBase {
  import spark.implicits._

  val edges: Seq[(Long, Long)] = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 3L), (5L, 4L),
    (6L, 1L)) // 6 has no in-edges; 2 has one; 3 is the big authority

  test("hubs/authorities match oracle to 1e-6") {
    val iters = 30
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var hub = vs.map(_ -> 1.0).toMap
    var auth = vs.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val aRaw = vs.map(v => v -> edges.filter(_._2 == v).map(e => hub(e._1)).sum).toMap
      val an = math.sqrt(aRaw.values.map(x => x * x).sum)
      auth = aRaw.map { case (v, x) => v -> x / an }
      val hRaw = vs.map(v => v -> edges.filter(_._1 == v).map(e => auth(e._2)).sum).toMap
      val hn = math.sqrt(hRaw.values.map(x => x * x).sum)
      hub = hRaw.map { case (v, x) => v -> x / hn }
    }
    val got = Hits.run(spark, edges.toDF("src", "dst"), iterations = iters)
      .scores.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    vs.foreach { v =>
      assert(math.abs(got(v)._1 - hub(v)) < 1e-6, s"hub($v)")
      assert(math.abs(got(v)._2 - auth(v)) < 1e-6, s"auth($v)")
    }
    // structural sanity: vertex 3 is the top authority, 5 a top hub
    assert(got.maxBy(_._2._2)._1 == 3L)
  }
}
