package graft

import org.apache.spark.sql.functions._

import graft.graph.Adjacency

/** Salted adjacency blocks: hub splitting, bounded block sizes, lossless
  * roundtrip, two-phase degree. */
class AdjacencySpec extends SparkTestBase {
  import spark.implicits._

  // hub vertex 0 with 100 out-edges; a few normal vertices
  val edges: Seq[(Long, Long, Double)] =
    (1L to 100L).map(d => (0L, d, d * 0.5)) ++
      Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 1L, 3.0))
  lazy val df = edges.toDF("src", "dst", "weight")

  test("hub adjacency splits into multiple bounded blocks") {
    val blocks = Adjacency.blocks(spark, df, blockSize = 16).collect()
    val hub = blocks.filter(_.getLong(0) == 0L)
    assert(hub.length == 7, s"ceil(100/16) salts, got ${hub.length}") // all salts hit w.h.p.
    // hash-mod salting is probabilistic: bound is ~blockSize, not exact
    assert(hub.map(_.getLong(2)).max <= 16L * 3)
    assert(hub.map(_.getLong(2)).sum == 100L)
    // non-hubs stay single-block
    assert(blocks.filter(r => r.getLong(0) != 0L).forall(_.getLong(1) == 0L))
  }

  test("explodeBlocks is a lossless inverse") {
    val back = Adjacency.explodeBlocks(Adjacency.blocks(spark, df, blockSize = 16))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == edges.toSet)
  }

  test("degreesFromBlocks matches direct degrees") {
    val got = Adjacency.degreesFromBlocks(Adjacency.blocks(spark, df, blockSize = 16))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 100L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
