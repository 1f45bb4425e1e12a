package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Queries

/** Dev tool: stage decomposition of the q_cc bench row — base edge-table
  * build/materialization vs t2 threshold vs the CC iteration proper — to
  * attribute bench drift (round-2 VERDICT item: the +13% q_cc regression
  * was the t2 cache re-running the full co-occurrence build; Queries.edges
  * now layers t2 as a filter over the cached base).
  * Usage: runMain graft.tools.ProfileCc [sfDir] [cpus] [reps]
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val reps = if (args.length > 2) args(2).toInt else 3
    (1 to reps).foreach { rep =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName(s"profile-cc-$rep")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.read.parquet(s"$sfDir/region.parquet").count() // warm
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      val (_, tAll) = time(Queries.edgesAll(spark, sfDir)) // cached() counts eagerly
      val (_, tT2) = time(Queries.edges(spark, sfDir))
      val (_, tCc) = time {
        graft.graph.ConnectedComponents.run(spark, Queries.edges(spark, sfDir))
          .write.mode("overwrite").format("noop").save()
      }
      println(f"[profile-cc] rep$rep base_build=$tAll%.3f t2_filter=$tT2%.3f cc_run=$tCc%.3f total=${tAll + tT2 + tCc}%.3f")
      Queries.clearCaches()
      spark.stop()
    }
  }
}
