package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor index over an embedding
  * column — the partition-pruning scale path next to the LSH route
  * ([[Similarity.lshTopK]]):
  *
  *  - a coarse k-means quantizer (`nlist` cells) is trained with a fixed
  *    number of Lloyd iterations; the centroids are model state (nlist × dim
  *    doubles — driver/literal scale, like any trained quantizer);
  *  - the corpus is assigned once to its nearest cell: `(id, cell)`. At
  *    scale this is the physical bucketing column of the stored index
  *    (write the embedding table bucketed/partitioned by `cell`), so a
  *    probe reads only ~nprobe/nlist of the data — partition pruning does
  *    the candidate filtering, no per-row work on the unprobed corpus;
  *  - a query probes its `nprobe` nearest cells and reranks exactly inside
  *    them with the same bounded top-k aggregator as the exact path
  *    (O(k) state per query, map-side combine).
  *
  * Determinism contract (what makes the DuckDB oracle replay exact):
  * init centroids = the embeddings of the `nlist` lowest ids (cell c =
  * rank-c id); per-iteration centroids = per-cell per-dimension means
  * ROUNDED to 6 dp (absorbs cross-engine float-sum-order noise); argmin
  * ties break to the lower cell id; cells that lose all members are
  * dropped. For a 100 TB corpus you would train on a sample — pass the
  * sample as `train`'s input; assignment/search use the model on the full
  * table.
  */
object Ivf {

  /** Trained coarse quantizer: (cell id, centroid) pairs, cell ids dense at
    * train start but possibly sparse after empty-cell drops. */
  case class Model(centroids: Vector[(Int, Array[Double])]) {
    require(centroids.nonEmpty, "IVF model must have at least one cell")
  }

  /** Squared L2 distance of `vec` to a literal centroid. */
  private def sqDist(vec: Column, c: Array[Double]): Column =
    aggregate(zip_with(vec, typedlit(c.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)

  /** Nearest-cell id via the native [[graft.functions.NearestCell]] codegen
    * expression: the centroid matrix is ONE reference object, the argmin a
    * runtime loop — plan size O(1) in nlist (the literal chain below is
    * O(nlist × dim) and blows whole-stage codegen at production cell
    * counts), result bit-identical (IvfSpec cross-checks at nlist = 256). */
  private def cellOf(vec: Column, model: Model): Column = {
    val (cells, mat) = modelArrays(model)
    graftshim.column(graft.functions.NearestCell(graftshim.expression(vec), cells, mat))
  }

  /** The declarative formulation — least() over (dist, cell) structs,
    * (d asc, cell asc) so ties go to the lower cell id. KEPT as the
    * spec cross-check twin of [[cellOf]]; do not use on wide models. */
  private[graft] def cellOfLiteral(vec: Column, model: Model): Column =
    least(model.centroids.map { case (cell, c) =>
      struct(sqDist(vec, c).as("d"), lit(cell).as("cell"))
    }: _*).getField("cell")

  /** Public literal-path cell assignment for the cross-validation spec. */
  private[graft] def cellsLiteral(corpus: DataFrame, model: Model,
                                  idCol: String = "id", vecCol: String = "vec"): DataFrame =
    corpus.select(col(idCol),
      cellOfLiteral(col(vecCol).cast("array<double>"), model).cast("long").as("cell"))

  private def modelArrays(model: Model): (Array[Int], Array[Array[Double]]) = {
    val sorted = model.centroids.sortBy(_._1)
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  private def graftshim = org.apache.spark.sql.graftshim.GraftShim

  /** Fixed-iteration seeded Lloyd k-means over `corpus` (or a sample of it
    * at scale). One Spark job per iteration: assign (narrow, literal
    * centroids) → per-cell per-dim mean (one partial-aggregated shuffle of
    * ≤ nlist × dim rows per partition) → collect the nlist × dim model. */
  def train(corpus: DataFrame, nlist: Int = 8, iters: Int = 5,
            idCol: String = "id", vecCol: String = "vec"): Model = {
    val ev = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    var model = Model(
      ev.orderBy("id").limit(nlist).collect().zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Double](1).toArray
      }.toVector)
    for (_ <- 0 until iters) {
      val assigned = ev.select(col("v"), cellOf(col("v"), model).as("cell"))
      val cents = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy("cell", "pos").agg(round(avg("val"), 6).as("cm"))
        .collect()
      model = Model(
        cents.groupBy(_.getInt(0)).toVector.sortBy(_._1).map { case (cell, rows) =>
          val c = new Array[Double](rows.length)
          rows.foreach(r => c(r.getInt(1)) = r.getDouble(2))
          cell -> c
        })
    }
    model
  }

  /** Cell assignment of the corpus under `model`: (id, cell). This is the
    * inverted file — at scale, the bucketing column of the stored index. */
  def cells(corpus: DataFrame, model: Model,
            idCol: String = "id", vecCol: String = "vec"): DataFrame =
    corpus.select(col(idCol),
      cellOf(col(vecCol).cast("array<double>"), model).cast("long").as("cell"))

  /** IVF top-k search: probe the `nprobe` nearest cells per query, rerank
    * candidates with exact cosine, bounded top-k per query.
    * @return (qid, id, sim, rank) — same contract as
    *         [[Similarity.bruteForceTopK]] restricted to probed cells. */
  def search(corpus: DataFrame, queries: DataFrame, model: Model, k: Int,
             nprobe: Int = 2,
             idCol: String = "id", vecCol: String = "vec",
             qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val c = Similarity.withNorm(corpus, idCol, vecCol, "_v", "_nv")
      .withColumn("cell", cellOf(col("_v"), model).cast("long"))
    val q = Similarity.withNorm(queries, qidCol, qvecCol, "_qv", "_nq")
    // nprobe nearest cells per query — native kernel, same O(1)-plan-size
    // story as cellOf (the array_sort-over-literal-structs twin it replaces
    // grew O(nlist × dim))
    val (cellIds, mat) = modelArrays(model)
    val probes = graftshim.column(
      graft.functions.NearestCells(graftshim.expression(col("_qv")), cellIds, mat, nprobe))
    val probed = q.select(col(qidCol), col("_qv"), col("_nq"),
        explode(probes).as("cell"))
    val scored = c.join(broadcast(probed), Seq("cell"))
      .where(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol),
        Similarity.cosineWithNorms(col("_v"), col("_qv"), col("_nv"), col("_nq")).as("sim"))
    Similarity.topKPerGroup(scored, k, qidCol, idCol)
  }
}
