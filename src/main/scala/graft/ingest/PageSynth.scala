package graft.ingest

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Model.Page

/** Deterministic Common-Crawl-style pages synthesizer (BASELINE.json
  * input_hint shape: url, warc_ts, html, text, lang).
  *
  * Everything is a pure function of (seed, n, i): the table can be
  * regenerated bit-identically at any scale/parallelism — that is the
  * per-row invariant the north rule demands (byte-identical extracted text
  * per url), and it means fixtures need no storage.
  *
  * Out-degrees follow a discrete power law (alpha ≈ 2.1, capped) so hub
  * vertices exercise the skew paths; link targets are hash-chosen, so the
  * edge set is also a pure function of (seed, n).
  *
  * Generation is `spark.range(n).map(...)` — embarrassingly parallel, no
  * shuffle, scales linearly with executors.
  */
object PageSynth {

  val Langs: Vector[String] = Vector("en", "de", "es", "fr", "pl", "it")

  private val Words: Vector[String] = Vector(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "web",
    "page", "graph", "link", "crawl", "data", "spark", "query", "join",
    "filter", "scan", "sort", "merge", "hash", "cluster", "rank", "node",
    "edge", "und", "der", "die", "das", "el", "la", "los", "le", "les",
    "und", "nie", "tak", "il", "di")

  /** splitmix64 — public-domain mixing function; stateless deterministic PRNG. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def uniform(h: Long): Double = ((h >>> 11).toDouble / (1L << 53).toDouble)

  def url(i: Long): String = s"https://host-${(i % 997)}.example/p/$i"

  /** Power-law out-degree: P(deg >= k) ~ k^-(alpha-1), capped. */
  def outDegree(seed: Long, i: Long, n: Long, alpha: Double = 2.1, cap: Int = 256): Int = {
    val u = math.max(uniform(mix(seed ^ mix(i * 31 + 7))), 1e-12)
    val d = math.pow(u, -1.0 / (alpha - 1.0))
    math.min(math.min(cap.toLong, n - 1), d.toLong).toInt
  }

  /** Link targets of page i (distinct, never i itself). */
  def targets(seed: Long, i: Long, n: Long): Seq[Long] = {
    val deg = outDegree(seed, i, n)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var k = 0
    while (out.size < deg && k < deg * 4) {
      val t = java.lang.Math.floorMod(mix(seed ^ mix(i) ^ (k * 0x9e3779b9L + 13)), n)
      if (t != i) out += t
      k += 1
    }
    out.toSeq
  }

  def text(seed: Long, i: Long): String = {
    val len = 8 + java.lang.Math.floorMod(mix(seed ^ mix(i * 131 + 3)), 56L).toInt
    val sb = new StringBuilder
    var k = 0
    while (k < len) {
      if (k > 0) sb.append(' ')
      sb.append(Words(java.lang.Math.floorMod(mix(seed ^ mix(i) ^ (k * 2654435761L)), Words.size.toLong).toInt))
      k += 1
    }
    sb.toString
  }

  def lang(seed: Long, i: Long): String =
    Langs(java.lang.Math.floorMod(mix(seed ^ mix(i * 17 + 11)), Langs.size.toLong).toInt)

  def warcTs(seed: Long, i: Long): Timestamp = {
    val epoch2024 = 1704067200000L // 2024-01-01T00:00:00Z
    new Timestamp(epoch2024 + java.lang.Math.floorMod(mix(seed ^ mix(i * 7 + 29)), 365L * 86400L) * 1000L)
  }

  /** href form of the link i→t: real crawl HTML mixes absolute, protocol-
    * relative, root-relative, dot-relative and fragment-suffixed links
    * (relative forms only when the target shares the page's host), plus
    * non-link anchors (mailto:/javascript:) that ingest must drop. All
    * forms resolve back to exactly `url(t)` — the generator's edge list
    * stays the ground truth. */
  def hrefForm(seed: Long, i: Long, t: Long): String = {
    val sameHost = i % 997 == t % 997
    val form = java.lang.Math.floorMod(mix(seed ^ mix(i) ^ mix(t + 3)), 5L).toInt
    form match {
      case 1 => "//" + s"host-${t % 997}.example/p/$t"       // protocol-relative
      case 2 if sameHost => s"/p/$t"                          // root-relative
      case 3 if sameHost => s"../p/$t"                        // dot-relative vs /p/<i>
      case 4 => url(t) + s"#frag$i"                           // fragment stripped
      case _ => url(t)                                        // absolute
    }
  }

  def html(seed: Long, i: Long, n: Long): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<html><head><title>p").append(i).append("</title></head><body><p>")
    sb.append(text(seed, i))
    sb.append("</p>")
    targets(seed, i, n).foreach { t =>
      sb.append("<a href=\"").append(hrefForm(seed, i, t)).append("\">t").append(t).append("</a>")
    }
    // non-link anchors: must be dropped by resolution, never reach the graph
    sb.append("<a href=\"mailto:admin@host-").append(i % 997).append(".example\">m</a>")
    sb.append("<a href=\"javascript:void(0)\">j</a>")
    sb.append("<a href=\"#top\">top</a>")
    sb.append("</body></html>")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  def page(seed: Long, i: Long, n: Long): Page =
    Page(url(i), warcTs(seed, i), html(seed, i, n), text(seed, i), lang(seed, i))

  /** The pages table: n rows, partition-parallel, no shuffle. */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            numPartitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = if (numPartitions > 0) spark.range(0, n, 1, numPartitions) else spark.range(n)
    base.map(i => page(seed, i, n))
  }

  /** Ground-truth edge list straight from the generator (for oracles). */
  def edgeList(seed: Long, n: Long): Seq[(Long, Long)] =
    (0L until n).flatMap(i => targets(seed, i, n).map(i -> _))
}
