package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query from SparkEntry.queries N times and print
  * per-run wall seconds; optionally dump the result to parquet.
  * Usage: runMain graft.RunOne <name> [sfDir] [cpus] [runs] [outParquet]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val runs = if (args.length > 3) args(3).toInt else 1
    val out = if (args.length > 4) Some(args(4)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[runone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    out.foreach(p => fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(p))
    spark.stop()
  }
}
