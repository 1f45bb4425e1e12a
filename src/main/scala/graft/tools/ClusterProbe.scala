package graft.tools

import org.apache.spark.sql.SparkSession

/** Feasibility probe for `local-cluster[n, cores, memMB]` — real separate
  * executor JVMs on one box (the closest sandbox shape to the north rule's
  * "N vs 4N executors": per-executor heaps and GC scale with N, unlike
  * local[k]'s one shared JVM). Requires SPARK_HOME and the app classes on
  * spark.jars so the spawned executors can load them.
  *
  * Usage: SPARK_HOME=/opt/spark runMain graft.tools.ClusterProbe <jar>
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val jar = args.headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .appName("graft-cluster-probe")
      .config("spark.jars", jar)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      // force real distributed work incl. our own classes on executors
      val df = spark.range(0, 1000000, 1, 8)
        .select(graft.functions.simhash64($"id".cast("string")).as("h"))
      val n = df.filter($"h" % 2 === 0).count()
      val execs = spark.sparkContext.statusTracker.getExecutorInfos.length
      println(s"[probe] count=$n executors=$execs (incl. driver)")
    } finally spark.stop()
  }
}
