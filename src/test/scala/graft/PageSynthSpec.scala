package graft

import graft.graph.PageRank
import graft.ingest.{LinkExtract, PageSynth}

/** Pages synthesizer + link extraction: determinism (the byte-identical
  * per-url text invariant), extraction == generator ground truth, skew. */
class PageSynthSpec extends SparkTestBase {
  import spark.implicits._

  val n = 500L
  val seed = 42L

  test("pages are deterministic; text byte-identical per url across regenerations") {
    val a = PageSynth.pages(spark, n, seed, numPartitions = 4).collect().sortBy(_.url)
    val b = PageSynth.pages(spark, n, seed, numPartitions = 7).collect().sortBy(_.url)
    assert(a.length == n)
    a.zip(b).foreach { case (x, y) =>
      assert(x.url == y.url)
      assert(x.text == y.text, s"text differs for ${x.url}")
      assert(java.util.Arrays.equals(x.html, y.html))
      assert(x.warc_ts == y.warc_ts && x.lang == y.lang)
    }
  }

  test("link extraction reproduces the generator's edge list exactly") {
    val pages = PageSynth.pages(spark, n, seed, numPartitions = 4)
    val got = LinkExtract.linkPairs(pages).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = PageSynth.edgeList(seed, n)
      .map { case (s, d) => (PageSynth.url(s), PageSynth.url(d)) }.toSet
    assert(got == expected)
  }

  test("out-degrees are skewed (power law)") {
    val degs = (0L until n).map(i => PageSynth.outDegree(seed, i, n))
    assert(degs.max >= 20, s"expected a hub, max=${degs.max}")
    val sorted = degs.sorted
    assert(sorted(n.toInt / 2) <= 5, s"median should be small, got ${sorted(n.toInt / 2)}")
  }

  test("pagerank over extracted links runs end-to-end on url-space") {
    val pages = PageSynth.pages(spark, 200L, seed, numPartitions = 4)
    val edges = LinkExtract.edges(pages)
    val dict = graft.ingest.Dictionary.buildSorted(
      edges.selectExpr("src as object").union(edges.selectExpr("dst as object")), "object")
    val enc = graft.ingest.Dictionary.encodeEdges(edges, dict)
    val res = PageRank.run(spark, enc, tol = 1e-6, maxIter = 60)
    assert(res.converged)
    val total = res.ranks.agg(org.apache.spark.sql.functions.sum("rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
  }
}
