package graft.ingest

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.Model.Page

/** href extraction: pages(html:binary) → edge table (src, dst, weight).
  *
  * The reference's "edge table" arrives precomputed (a distances TSV); per
  * SURVEY.md §2.7 the one genuinely custom scalar operator our engine adds
  * is this link extractor. v1 is a typed flatMap (narrow, no shuffle,
  * pipeline-parallel over page partitions); it can be promoted to a codegen
  * Catalyst Generator if the scan ever dominates (SURVEY.md §4.3).
  *
  * weight = link multiplicity (how many times src links dst), computed with
  * one map-side-combined groupBy.
  */
object LinkExtract {

  private val Href = """<a\s+href="([^"]+)"""".r

  def hrefs(html: Array[Byte]): Seq[String] =
    Href.findAllMatchIn(new String(html, StandardCharsets.UTF_8)).map(_.group(1)).toSeq

  /** (src_url, dst_url) one row per anchor occurrence, hrefs RESOLVED
    * against the page url and normalized (real-web HTML is mostly relative
    * links — raw hrefs would be a silently wrong edge table); non-http(s),
    * fragment-only and malformed links are dropped.
    *
    * Uses the native codegen expressions [[graft.functions.ExtractHrefs]] and
    * [[graft.functions.ResolveUrl]]: the scan projects only (url, html) and
    * extraction + resolution + explode stay inside whole-stage codegen with
    * no Page encoder round-trip. The typed flatMap form is kept as
    * [[linkPairsTyped]] for cross-validation. */
  def linkPairs(pages: Dataset[Page]): DataFrame =
    pages.toDF()
      .select(col("url").as("src"),
        explode(graft.functions.extract_hrefs(col("html"))).as("raw"))
      .select(col("src"),
        graft.functions.resolve_url(col("src"), col("raw")).as("dst"))
      .where(col("dst").isNotNull)

  /** Typed-flatMap extractor (same output as [[linkPairs]]; spec oracle). */
  def linkPairsTyped(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap { p =>
      hrefs(p.html).iterator
        .map(h => graft.functions.UrlKernel.resolveStr(p.url, h))
        .filter(_ != null)
        .map(d => (p.url, d))
    }.toDF("src", "dst")
  }

  /** Edge table with multiplicity weight; self-links dropped (P3). */
  def edges(pages: Dataset[Page]): DataFrame =
    linkPairs(pages)
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst")
      .agg(count(lit(1)).cast("double").as("weight"))
}
