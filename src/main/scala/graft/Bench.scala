package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], prints exactly one JSON
  * line {"metric","value","unit","queries","sf"}.
  *
  * The headline set covers each engine area: edge build + graph algorithms
  * (the north-rule flagship), dedup, text, similarity, events. PageRank also
  * reports edges×supersteps/sec (the BASELINE.json metric) under
  * "pagerank_edges_per_sec" — cross-parallelism scaling evidence lives in
  * ScalingBench/BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq(
      "q_edges_build", "q_cc", "q_cluster_shape", "q_triangles",
      "q_pagerank", "q_lpa",
      "q_exact_dedup", "q_minhash_pairs", "q_simhash",
      "q_text_quality", "q_langid",
      "q_ann_topk", "q_embed_neardup",
      "q_sessions", "q_window_counts")

    // warm the JVM/codegen once on the smallest table scan
    spark.read.parquet(s"$sfDir/region.parquet").count()

    var prEdgesPerSec = 0.0
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      if (name == "q_pagerank" && ok) {
        // rough edges/sec: supersteps * |edges| / wall
        val nEdges = Queries.edges(spark, sfDir).count()
        prEdgesPerSec = nEdges.toDouble * 30 / sec
      }
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"pagerank_edges_per_sec":${f"$prEdgesPerSec%.0f"}}""")
    spark.stop()
  }
}
