package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage for the edge table — the co-located-join scale path.
  *
  * At 100 TB the dominant cost of every per-vertex operator
  * (degree, adjacency build, PageRank's rank⋈links, CC's star joins) is the
  * shuffle that hash-partitions edges by vertex. Writing the edge table
  * BUCKETED BY the join key moves that shuffle to write time, once: every
  * subsequent `groupBy(src)` / equi-join on `src` reads the bucketing
  * metadata and runs **exchange-free** (Catalyst's `output partitioning`
  * satisfies the required `HashClusteredDistribution`). This is the Spark
  * equivalent of the reference keeping its adjacency matrix sharded by
  * `lid % numUpdaters` (graph_sparse.h:294) — persistent, instead of
  * rebuilt per run.
  *
  * `spark.sql.sources.bucketing.enabled` is on by default; the table lives
  * in the session catalog's warehouse as parquet. Bucket count is the
  * write-time parallelism knob — at cluster scale, O(cores) or a small
  * multiple; AQE cannot coalesce it away because there is no exchange left.
  */
object BucketedEdges {

  /** Write `edges` (src, dst, weight) as a parquet table bucketed by src.
    * One shuffle here buys exchange-free per-vertex plans forever after. */
  def write(edges: DataFrame, table: String, buckets: Int = 32): Unit =
    edges
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "src")
      .sortBy("src") // within-bucket clustering: vertex rows are contiguous
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Per-vertex degree over the bucketed table — zero exchanges: the
    * partial and final aggregation collapse into one stage because the scan
    * already delivers rows clustered by src. */
  def degrees(spark: SparkSession, table: String): DataFrame =
    read(spark, table).groupBy(col("src").as("vertex"))
      .agg(count(lit(1)).cast("long").as("degree"))

  /** Bucket-aware equi self-join on src (the wedge/adjacency shape): both
    * sides share the bucketing, so the join runs with no exchange on
    * either side. */
  def selfJoinOnSrc(spark: SparkSession, table: String): DataFrame = {
    val l = read(spark, table).select(col("src"), col("dst").as("dst_l"))
    val r = read(spark, table).select(col("src"), col("dst").as("dst_r"))
    l.join(r, "src").where(col("dst_l") < col("dst_r"))
  }

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * the assertion target for the exchange-free claims above. */
  def hasShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) ||
      plan.exists {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.exists(
            _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
        case _ => false
      }
  }
}
