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
                                eager: Boolean): org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val ck = classic.localCheckpoint(eager)
    ck.sparkSession.internalCreateDataFrame(ck.queryExecution.toRdd, ck.schema, isStreaming = false)
  }
}
