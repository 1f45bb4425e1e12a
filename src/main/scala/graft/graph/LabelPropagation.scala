package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation — the Spark-native counterpart of clusty's
  * Leiden community detection (SURVEY.md §2.6 C6; the reference itself
  * delegates Leiden to igraph and ships without it by default,
  * src/leiden.h:36-50).
  *
  * Deterministic variant: every superstep each vertex adopts the most
  * frequent label among its neighbors, ties broken by the smaller label id —
  * a pure (count desc, label asc) argmax, so results are independent of
  * partitioning/arrival order (our substitute for the reference's ordered
  * mapper determinism).
  *
  * Each superstep: one shuffle to group neighbor labels, one window argmax
  * (re-uses the same hash partitioning on dst), one join back. Lineage
  * truncated per superstep via localCheckpoint.
  */
object LabelPropagation {

  /** @param edges (src, dst) undirected pairs (any orientation, dups ok).
    * @return (vertex: Long, label: Long) after `iterations` supersteps or
    *         earlier if a fixpoint is reached.
    */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int = 10): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
    val bi = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    val vertices = bi.select(col("src").as("vertex")).distinct()
      .localCheckpoint(true)

    var labels = vertices.select(col("vertex"), col("vertex").as("label"))
      .localCheckpoint(true)

    var it = 0
    var stable = false
    while (!stable && it < iterations) {
      val msgs = bi.join(labels, bi("src") === labels("vertex"))
        .select(col("dst"), col("label"))
      val counts = msgs.groupBy(col("dst"), col("label")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("dst")).orderBy(col("n").desc, col("label").asc)
      val best = counts.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("dst").as("vertex"), col("label").as("new_label"))

      val newLabels = labels.join(best, Seq("vertex"), "left")
        .select(col("vertex"), coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(true)

      val changed = newLabels.as("a").join(labels.as("b"), "vertex")
        .where(col("a.label") =!= col("b.label")).limit(1).count()
      stable = changed == 0L
      labels = newLabels
      it += 1
    }
    labels
  }
}
