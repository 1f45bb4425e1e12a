package graft.cluster

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.ConnectedComponents

/** clusty's greedy clustering algorithms (SURVEY.md §2.6 C2-C5), Spark-first:
  * these are inherently sequential *within* a connected component (each
  * decision depends on previous ones), but components are independent — so we
  * distribute per-component via `cogroup` + sequential per-group logic:
  * parallelism = number of components, exactness = reference semantics.
  *
  * At web scale the post-threshold components are small (the reference makes
  * the same assumption: its versions are single-threaded whole-graph,
  * reference src/set_cover.h:21-68, src/cd_hit.h:20-58, src/uclust.h:20-68,
  * src/linkage_heaptrix.h:795-969); `maxComponentSize` guards against a
  * giant component landing in one task — callers must threshold harder or
  * fall back to single-linkage for such graphs.
  *
  * Inputs: edges (src, dst, weight=distance), ranks (vertex, rank) with rank
  * = priority/representativeness order (lower = more representative).
  * Output: (vertex, cluster) with cluster = seed vertex id.
  */
object GreedyClustering {

  sealed trait Algo
  case object SetCover extends Algo // visit by (degree desc, rank asc); seed captures unassigned neighbors
  case object CdHit extends Algo    // visit by rank asc; seed captures unassigned neighbors
  case object Uclust extends Algo   // visit by rank asc; join closest seed neighbor else become seed

  def run(spark: SparkSession, edges: DataFrame, ranks: DataFrame, algo: Algo,
          maxComponentSize: Int = 5000000,
          precomputedCC: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._

    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double")).where(col("src") =!= col("dst"))
    val cc = precomputedCC.getOrElse(ConnectedComponents.run(spark, e))

    // tag each edge and each vertex with its component
    val eTagged = e.join(cc.withColumnRenamed("vertex", "src"), "src")
      .select(col("component"), col("src"), col("dst"), col("weight"))
      .as[(Long, Long, Long, Double)]
    val vTagged = ranks.select(col("vertex").cast("long"), col("rank").cast("long"))
      .join(cc, "vertex")
      .select(col("component"), col("vertex"), col("rank"))
      .as[(Long, Long, Long)]

    val grouped = eTagged.groupByKey(_._1).cogroup(vTagged.groupByKey(_._1)) {
      (comp, es, vs) =>
        val adj = mutable.Map.empty[Long, mutable.Map[Long, Double]]
        var nE = 0
        es.foreach { case (_, s, d, w) =>
          // undirected; parallel edges keep min distance (A1 semantics)
          val m1 = adj.getOrElseUpdate(s, mutable.Map.empty)
          m1.update(d, math.min(w, m1.getOrElse(d, Double.MaxValue)))
          val m2 = adj.getOrElseUpdate(d, mutable.Map.empty)
          m2.update(s, math.min(w, m2.getOrElse(s, Double.MaxValue)))
          nE += 1
          if (nE > maxComponentSize) throw new IllegalStateException(
            s"component $comp exceeds maxComponentSize=$maxComponentSize edges; " +
              "threshold harder or use single linkage")
        }
        val rankOf = mutable.Map.empty[Long, Long]
        vs.foreach { case (_, v, r) => rankOf(v) = r }
        // vertices possibly missing from ranks get lowest priority
        adj.keys.foreach(v => if (!rankOf.contains(v)) rankOf(v) = Long.MaxValue)

        sequential(algo, adj, rankOf.toMap).iterator
    }
    grouped.toDF("vertex", "cluster")
  }

  /** The reference-faithful sequential greedy pass over one component. */
  private[cluster] def sequential(algo: Algo,
      adj: mutable.Map[Long, mutable.Map[Long, Double]],
      rankOf: Map[Long, Long]): Seq[(Long, Long)] = {
    val vertices = adj.keys.toSeq
    val order = algo match {
      case SetCover =>
        // stable: degree desc, priority asc (reference sorts objects already
        // in priority order stably by degree, src/set_cover.h:36-43)
        vertices.sortBy(v => (-adj(v).size.toLong, rankOf(v), v))
      case _ => vertices.sortBy(v => (rankOf(v), v))
    }
    val assigned = mutable.Map.empty[Long, Long]
    algo match {
      case SetCover | CdHit =>
        order.foreach { v =>
          if (!assigned.contains(v)) {
            assigned(v) = v // v becomes a seed
            adj(v).keys.foreach { u => if (!assigned.contains(u)) assigned(u) = v }
          }
        }
      case Uclust =>
        val seeds = mutable.Set.empty[Long]
        order.foreach { v =>
          // closest neighbor that is already a seed (ties: earlier seed rank)
          val cand = adj(v).view.filter { case (u, _) => seeds(u) }.toSeq
          if (cand.isEmpty) { seeds += v; assigned(v) = v }
          else {
            val (bestSeed, _) = cand.minBy { case (u, w) => (w, rankOf(u), u) }
            assigned(v) = bestSeed
          }
        }
    }
    assigned.toSeq
  }

  /** Complete linkage (reference src/linkage_heaptrix.h:795-969 semantics):
    * agglomerative max-linkage merge of the closest cluster pair; after a
    * merge, a neighbor survives only if it had finite distance to BOTH merged
    * clusters; merging stalls when no mutually-connected pair remains (even
    * with threshold=+inf the result is greedy quasi-cliques, NOT connected
    * components). Distributed per component like the greedy covers.
    * Output cluster id = min member vertex id.
    */
  def completeLinkage(spark: SparkSession, edges: DataFrame, threshold: Double = Double.MaxValue,
                      maxComponentSize: Int = 5000000,
                      precomputedCC: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double")).where(col("src") =!= col("dst"))
    val cc = precomputedCC.getOrElse(ConnectedComponents.run(spark, e))
    val eTagged = e.join(cc.withColumnRenamed("vertex", "src"), "src")
      .select(col("component"), col("src"), col("dst"), col("weight"))
      .as[(Long, Long, Long, Double)]

    eTagged.groupByKey(_._1).flatMapGroups { (comp, es) =>
      val dist = mutable.Map.empty[(Long, Long), Double]
      val members = mutable.Map.empty[Long, List[Long]]
      var nE = 0
      es.foreach { case (_, s, d, w) =>
        val k = if (s < d) (s, d) else (d, s)
        dist.update(k, math.min(w, dist.getOrElse(k, Double.MaxValue)))
        members.getOrElseUpdate(s, List(s)); members.getOrElseUpdate(d, List(d))
        nE += 1
        if (nE > maxComponentSize) throw new IllegalStateException(
          s"component $comp too large for complete linkage")
      }
      completeLinkageSequential(dist, members, threshold).iterator
    }.toDF("vertex", "cluster")
  }

  private[cluster] def completeLinkageSequential(
      dist: mutable.Map[(Long, Long), Double],
      members: mutable.Map[Long, List[Long]],
      threshold: Double): Seq[(Long, Long)] = {
    val active = mutable.Set.empty[Long] ++ members.keys
    var continue = true
    while (continue && active.size > 1) {
      // closest pair among finite entries (deterministic tie-break on key)
      val best = dist.iterator.filter { case ((a, b), w) =>
        active(a) && active(b) && w <= threshold }
        .reduceOption(Ordering.by[((Long, Long), Double), (Double, Long, Long)] {
          case (k, w) => (w, k._1, k._2) }.min(_, _))
      if (best.isEmpty) continue = false
      else {
        val ((a, b), _) = best.get
        // merge b into a: new distances = max; neighbor must be connected to BOTH
        val keep = math.min(a, b); val drop = math.max(a, b)
        active -= drop
        members(keep) = members(keep) ++ members(drop)
        members.remove(drop)
        active.foreach { c =>
          if (c != keep) {
            val k1 = if (keep < c) (keep, c) else (c, keep)
            val k2 = if (drop < c) (drop, c) else (c, drop)
            (dist.get(k1), dist.get(k2)) match {
              case (Some(w1), Some(w2)) => dist(k1) = math.max(w1, w2)
              case (Some(_), None) => dist.remove(k1) // not connected to both
              case (None, Some(_)) => ()              // stays disconnected
              case _ => ()
            }
            dist.remove(k2)
          }
        }
        dist.remove(if (keep < drop) (keep, drop) else (drop, keep))
      }
    }
    members.toSeq.flatMap { case (c, ms) =>
      val label = ms.min
      ms.map(_ -> label)
    }
  }
}
