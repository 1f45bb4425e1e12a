package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-6 optimization evidence: dumps `.explain("formatted")` for each
  * named query into plans/r06/<query>_<tag>.txt (tag = before|after), so
  * plan-shape claims in OPTIMIZATION_r06.md are checkable without Spark.
  *
  * Usage: runMain graft.tools.DumpPlansR06 <tag> [sfDir] [q1 q2 ...]
  */
object DumpPlansR06 {
  val DefaultQueries: Seq[String] = Seq(
    "q_edges_build", "q_cc", "q_pagerank", "q_pagerank_full", "q_lpa",
    "q_triangles", "q_minhash_pairs", "q_embed_neardup",
    "q_anf", "q_reach_curve", "q_vocab_stats", "q_salsa", "q_hits",
    "q_scc", "q_bipartite", "q_cluster_shape", "q_sessions")

  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val qs = if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)
    qs.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val bos = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(bos, true, "UTF-8")) { df.explain("formatted") }
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        bos.toString("UTF-8").getBytes(StandardCharsets.UTF_8))
      println(s"[plans-r06] wrote ${name}_$tag.txt")
    }
    graft.Queries.clearCaches()
    spark.stop()
  }
}
