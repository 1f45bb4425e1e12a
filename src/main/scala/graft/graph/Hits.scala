package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS (Kleinberg hubs & authorities) — the other canonical link-analysis
  * operator, on the same superstep discipline as PageRank: the edge table is
  * partitioned once and persisted, per half-step one join + one partial-
  * aggregated sum, state lazily checkpointed and materialized by the single
  * aggregate that also returns the L2 norm for the next normalization.
  *
  *   authority(v) = Σ_{u→v} hub(u)   then L2-normalize
  *   hub(u)       = Σ_{u→v} auth(v)  then L2-normalize
  */
object Hits {

  final case class Result(scores: DataFrame, iterations: Int)

  /** @param edges (src, dst) directed.
    * @return (vertex, hub, authority), both L2-normalized. */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int = 20): Result = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    val vertices = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex"))).distinct()
      .localCheckpoint(true)

    var hubs = vertices.select(col("vertex"), lit(1.0).as("hub"))
      .localCheckpoint(true)
    var auths: DataFrame = vertices.select(col("vertex"), lit(1.0).as("authority"))

    var it = 0
    while (it < iterations) {
      // authority step: sum incoming hub mass, L2-normalize
      val aRaw = e.join(hubs, e("src") === hubs("vertex"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("a"))
        .select(col("dst").as("vertex"), col("a"))
        .localCheckpoint(false)
      val aNorm = math.sqrt(aRaw.agg(sum(col("a") * col("a"))).head().getDouble(0))
      auths = aRaw.select(col("vertex"), (col("a") / lit(aNorm)).as("authority"))

      // hub step: sum outgoing authority mass, L2-normalize
      val hRaw = e.join(auths, e("dst") === auths("vertex"))
        .groupBy(col("src")).agg(sum(col("authority")).as("h"))
        .select(col("src").as("vertex"), col("h"))
        .localCheckpoint(false)
      val hNorm = math.sqrt(hRaw.agg(sum(col("h") * col("h"))).head().getDouble(0))
      hubs = hRaw.select(col("vertex"), (col("h") / lit(hNorm)).as("hub"))
      it += 1
    }

    // vertices with no out-edges have hub 0 (and dually for authority)
    val scores = vertices
      .join(hubs, Seq("vertex"), "left")
      .join(auths, Seq("vertex"), "left")
      .select(col("vertex"),
        coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("authority"), lit(0.0)).as("authority"))
    e.unpersist(blocking = false)
    Result(scores, it)
  }
}
