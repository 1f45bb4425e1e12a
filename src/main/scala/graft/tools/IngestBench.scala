package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ingest.{Dictionary, LinkExtract, PageSynth}

/** Ingest-path throughput: pages → href extraction (native codegen
  * expression) → weighted edge table → dictionary encode, the front half of
  * the north-star pipeline. Prints one JSON line with pages/sec and
  * edges/sec.
  *
  * Usage: runMain graft.tools.IngestBench [nPages] [cpus]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = PageSynth.pages(spark, n, seed = 42L, numPartitions = cpus * 4)
    pages.toDF().write.mode("overwrite").format("noop").save() // warm codegen (untimed synth pass)

    val t0 = System.nanoTime()
    val edges = LinkExtract.edges(pages)
    val dict = Dictionary.buildSorted(
      edges.selectExpr("src as object").union(edges.selectExpr("dst as object")), "object")
    val encoded = Dictionary.encodeEdges(edges, dict)
    val nEdges = encoded.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"ingest_pages_per_sec","value":${n / sec}%.0f,"unit":"pages/sec","pages":$n,"edges":$nEdges,"wall_sec":$sec%.2f,"edges_per_sec":${nEdges / sec}%.0f,"cpus":$cpus}""")
    spark.stop()
  }
}
