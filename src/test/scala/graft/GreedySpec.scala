package graft

import org.apache.spark.sql.functions._

import graft.cluster.GreedyClustering
import graft.cluster.GreedyClustering.{CdHit, SetCover, Uclust}

/** Greedy clustering algorithms on the synth.ani topology (distances =
  * 1 - ani, filter ani >= 0.70). Expectations derived by hand from the
  * reference semantics (reference src/set_cover.h, src/cd_hit.h,
  * src/uclust.h, src/linkage_heaptrix.h — see GreedyClustering scaladoc). */
class GreedySpec extends SparkTestBase {
  import spark.implicits._

  // dictionary = objects-file rank: aaa=0 aa=1 a=2 bb=3 b=4 c=5 d=6 e=7 f=8 g=9 xxx=10 xx=11 x=12
  // surviving edges (ani>=0.70) as distances (1-ani), dedup min:
  val edges = Seq(
    (10L, 11L, 0.07), // xxx-xx
    (0L, 1L, 0.06),   // aaa-aa
    (0L, 2L, 0.08),   // aaa-a
    (11L, 12L, 0.06), // xx-x
    (3L, 4L, 0.01),   // bb-b (min of .29/.01)
    (1L, 2L, 0.11)    // aa-a
  ).toDF("src", "dst", "weight")
  val ranks = (0L to 12L).map(v => (v, v)).toDF("vertex", "rank")

  def runAlgo(algo: GreedyClustering.Algo): Map[Long, Long] =
    GreedyClustering.run(spark, edges, ranks, algo)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("set-cover: highest-degree seeds capture neighbors") {
    // degrees: 0:2 1:2 2:2 11:2 | 10:1 12:1 3:1 4:1 → visit 0 first, then 11
    assert(runAlgo(SetCover) == Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L,
      11L -> 11L, 10L -> 11L, 12L -> 11L,
      3L -> 3L, 4L -> 3L))
  }

  test("cd-hit: priority-order seeds capture neighbors") {
    assert(runAlgo(CdHit) == Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L,
      12L -> 12L)) // x: its only neighbor xx is assigned but not a seed
  }

  test("uclust: join closest existing seed, else become seed") {
    assert(runAlgo(Uclust) == Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L,
      12L -> 12L))
  }

  test("complete linkage: merge stalls without mutual connectivity") {
    val got = GreedyClustering.completeLinkage(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {aaa,aa,a} full triangle merges; {xx,x} merge first (.06), then xxx has
    // no finite distance to x → stalls as singleton; {bb,b} merges.
    assert(got == Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L,
      11L -> 11L, 12L -> 11L, 10L -> 10L,
      3L -> 3L, 4L -> 3L))
  }

  test("uclust on a chain: second hop joins the seed only if adjacent") {
    // chain 0-1-2 with 0 highest priority: 0 seed; 1 joins 0; 2's neighbor 1
    // is not a seed → 2 becomes seed (order-dependent greedy, C3 semantics)
    val chain = Seq((0L, 1L, 0.1), (1L, 2L, 0.1)).toDF("src", "dst", "weight")
    val r = (0L to 2L).map(v => (v, v)).toDF("vertex", "rank")
    val got = GreedyClustering.run(spark, chain, r, Uclust)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
  }
}
