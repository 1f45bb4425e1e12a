package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim for `private[sql]` bridge API (the usual pattern for Spark
  * extension libraries): Column <-> catalyst Expression conversion, needed to
  * expose native codegen expressions through the public Column API. */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on a live session (the extensions-free path;
    * `graft.plans.GraftExtensions` covers the spark.sql.extensions path). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")

  /** `localCheckpoint` that also resets plan STATISTICS, for loop-carried
    * superstep state.
    *
    * `Dataset.localCheckpoint` truncates the logical plan to a `LogicalRDD`
    * but copies the pre-checkpoint plan's estimated `Statistics` into it.
    * In an iterative loop whose state appears k times in the next step's
    * plan, `sizeInBytes` therefore compounds to (2^63)^(k^step) — a BigInt
    * whose DIGIT COUNT grows exponentially with the superstep number, until
    * the driver stalls for minutes inside BigInteger multiplication during
    * stats estimation (measured: a 4-reference loop becomes unusable at
    * ~10 supersteps). Rebuilding the frame over the checkpointed RDD drops
    * the inherited stats; AQE re-plans joins from true runtime sizes anyway.
    */
  def localCheckpointResetStats(df: org.apache.spark.sql.DataFrame,
                                eager: Boolean): org.apache.spark.sql.DataFrame =
    localCheckpointResetStatsReleasable(df, eager)._1

  /** [[localCheckpointResetStats]] plus a release thunk that UNPERSISTS the
    * checkpointed blocks. A superstep loop that checkpoints new state every
    * iteration otherwise accumulates every previous step's blocks until the
    * ContextCleaner gets around to them — with a large driver heap GC (and
    * hence the cleaner) runs rarely, and the memory store's eviction churn
    * shows up as progressively slower supersteps late in a run. Call the
    * thunk only once NOTHING will read that state again (a localCheckpoint
    * has no lineage to recompute from): i.e. release step k-1 after step
    * k's checkpoint has fully materialized. */
  def localCheckpointResetStatsReleasable(df: org.apache.spark.sql.DataFrame,
                                          eager: Boolean)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val ck = classic.localCheckpoint(eager)
    val handle = ck.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
    val out = ck.sparkSession.internalCreateDataFrame(
      ck.queryExecution.toRdd, ck.schema, isStreaming = false)
    (out, () => handle.foreach(_.unpersist(blocking = false)))
  }
}
