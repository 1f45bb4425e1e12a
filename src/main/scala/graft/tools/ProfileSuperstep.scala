package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.PageRank
import graft.ingest.{Dictionary, LinkExtract, PageSynth}

/** Dev tool: isolate the non-scaling per-superstep serial term of the
  * PageRank loop. Fits T(cores) = S + P/cores over the steady-state
  * superstep medians and A/B-tests config knobs (AQE on/off) that change
  * the driver-side cost per superstep.
  * Usage: runMain graft.tools.ProfileSuperstep [nPages] [cores...]
  */
object ProfileSuperstep {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 4000000L
    val cores = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(4, 16)
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val edgePath = s"$tmp/edges"
    session(16, aqe = true) { spark =>
      val pages = PageSynth.pages(spark, nPages, seed = 42L, numPartitions = 64)
      val edges = LinkExtract.edges(pages)
      val dict = Dictionary.buildSorted(
        edges.selectExpr("src as object").union(edges.selectExpr("dst as object")), "object")
      Dictionary.encodeEdges(edges, dict).select("src", "dst")
        .repartition(64).write.mode("overwrite").parquet(edgePath)
    }
    for (aqe <- Seq(true, false); c <- cores) {
      session(c, aqe) { spark =>
        val edges = spark.read.parquet(edgePath)
        PageRank.run(spark, edges, tol = 0.0, maxIter = 3) // warm
        val r = PageRank.run(spark, edges, tol = 0.0, maxIter = 10)
        val ss = r.stepSeconds.drop(2).sorted
        val med = ss(ss.length / 2)
        println(f"[profstep] cores=$c aqe=$aqe steady_median=$med%.2f first=${r.stepSeconds.head}%.2f all=${r.stepSeconds.map(s => f"$s%.2f").mkString(",")}")
      }
    }
  }

  private def session(cores: Int, aqe: Boolean)(f: SparkSession => Unit): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"prof-$cores-$aqe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark) finally spark.stop()
  }
}
