package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlKernel

/** URL resolution + normalization for link ingest: relative paths,
  * protocol-relative, root-relative, dot segments, fragments, scheme
  * filtering, malformed input — kernel-level cases plus the codegen
  * expression and the e2e PageSynth path (which now emits all href forms). */
class ResolveUrlSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "https://host-1.example/a/b/page.html?x=1"

  test("kernel: RFC-3986 reference resolution cases") {
    def r(h: String): String = UrlKernel.resolveStr(base, h)
    // absolute
    assert(r("https://other.example/p/2") == "https://other.example/p/2")
    // protocol-relative inherits the base scheme
    assert(r("//cdn.example/lib.js") == "https://cdn.example/lib.js")
    // root-relative
    assert(r("/top") == "https://host-1.example/top")
    // sibling-relative resolves against the base directory
    assert(r("next.html") == "https://host-1.example/a/b/next.html")
    // dot segments
    assert(r("../up.html") == "https://host-1.example/a/up.html")
    assert(r("./here.html") == "https://host-1.example/a/b/here.html")
    assert(r("../../../overshoot") == "https://host-1.example/overshoot")
    // fragments are stripped; fragment-only links are dropped
    assert(r("page2.html#sec3") == "https://host-1.example/a/b/page2.html")
    assert(r("#top") == null)
    // query preserved
    assert(r("/q?a=b&c=d") == "https://host-1.example/q?a=b&c=d")
  }

  test("kernel: normalization and filtering") {
    def r(b: String, h: String): String = UrlKernel.resolveStr(b, h)
    // scheme/host lowercased, default ports stripped, empty path -> "/"
    assert(r(base, "HTTPS://Host-2.EXAMPLE:443") == "https://host-2.example/")
    assert(r(base, "http://h.example:80/x") == "http://h.example/x")
    assert(r(base, "http://h.example:8080/x") == "http://h.example:8080/x")
    // non-http(s) schemes dropped
    assert(r(base, "mailto:a@b.c") == null)
    assert(r(base, "javascript:void(0)") == null)
    assert(r(base, "data:text/plain;base64,AAA") == null)
    assert(r(base, "ftp://h/x") == null)
    // malformed
    assert(r(base, "http://[not-a-host/") == null)
    assert(r("not a uri", "/x") == null)
  }

  test("codegen expression matches the kernel and drops nulls") {
    val rows = Seq(
      (base, "../up.html"),
      (base, "#top"),
      (base, "mailto:x@y.z"),
      (base, "//cdn.example/a"))
    val got = rows.toDF("b", "h")
      .select(graft.functions.resolve_url(col("b"), col("h")).as("r"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == rows.map { case (b, h) => Option(UrlKernel.resolveStr(b, h)) })
  }

  test("e2e: PageSynth's mixed href forms resolve back to the ground-truth edges") {
    val n = 300L
    val pages = graft.ingest.PageSynth.pages(spark, n, seed = 7L, numPartitions = 4)
    val got = graft.ingest.LinkExtract.linkPairs(pages)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = graft.ingest.PageSynth.edgeList(7L, n)
      .map { case (s, d) => (graft.ingest.PageSynth.url(s), graft.ingest.PageSynth.url(d)) }.toSet
    assert(got == expected) // noise anchors dropped, every relative form restored
  }
}
