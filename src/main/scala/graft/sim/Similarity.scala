package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`).
  *
  *  - [[cosine]] — zip_with + aggregate dot product, pure codegen expression.
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *    against the corpus, per-query window top-k. One broadcast join, one
  *    shuffle on query id: the right plan when |queries| ≪ |corpus|.
  *  - [[lshTopK]] — scale path: random-hyperplane signature (deterministic
  *    seeded planes), candidates = same signature-band bucket, rerank
  *    exactly. Probe cost drops from O(|corpus|) to O(bucket).
  *  - [[nearDupPairs]] — embedding-cosine near-duplicate detection via the
  *    same LSH buckets.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact top-k neighbors for each query vector.
    * @param corpus  (id, vec) — the full embedding table
    * @param queries (qid, qvec) — small enough to broadcast
    * @return (qid, id, sim, rank) — per query, k best by (sim desc, id asc) */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "id", vecCol: String = "vec",
                     qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = corpus.join(broadcast(queries), col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol).cast("array<double>"), col(qvecCol).cast("array<double>")).as("sim"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim j):
    * a ±1 Rademacher plane derived from xxhash64 — seedable, shuffle-free,
    * identical on every executor without broadcasting plane matrices. */
  private def planeSign(p: Int, j: Column, seed: Long): Column =
    when(shiftright(xxhash64(lit(seed), lit(p), j), 7).bitwiseAND(lit(1L)) === 1L, lit(1.0d))
      .otherwise(lit(-1.0d))

  /** nBits-bit random-hyperplane signature of a vector. */
  def rhpSignature(vec: Column, nBits: Int = 16, seed: Long = 42L): Column = {
    val bits = transform(sequence(lit(0), lit(nBits - 1)), p => {
      // projection onto plane p = sum_j sign(p,j) * v[j]
      val proj = aggregate(
        zip_with(vec.cast("array<double>"), sequence(lit(0), size(vec) - 1),
          (v, j) => v * when(shiftright(xxhash64(lit(seed), p, j), 7)
            .bitwiseAND(lit(1L)) === 1L, lit(1.0d)).otherwise(lit(-1.0d))),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0.0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: candidates share at least one signature band; rerank
    * candidates with exact cosine, keep top-k per query. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int = 16, bands: Int = 4, seed: Long = 42L,
              idCol: String = "id", vecCol: String = "vec",
              qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    require(nBits % bands == 0)
    val r = nBits / bands
    val mask = (1L << r) - 1
    def bandCols(sig: Column): Column =
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), call_function("shiftright", sig, b * lit(r)).bitwiseAND(lit(mask)).as("bucket")))

    val cs = corpus.select(col(idCol), col(vecCol),
      explode(bandCols(rhpSignature(col(vecCol), nBits, seed))).as("bb"))
      .select(col(idCol), col(vecCol), col("bb.band"), col("bb.bucket"))
    val qs = queries.select(col(qidCol), col(qvecCol),
      explode(bandCols(rhpSignature(col(qvecCol), nBits, seed))).as("bb"))
      .select(col(qidCol), col(qvecCol), col("bb.band"), col("bb.bucket"))

    val cand = cs.join(broadcast(qs), Seq("band", "bucket"))
      .where(col(idCol) =!= col(qidCol))
      .select(col(qidCol), col(idCol), col(vecCol), col(qvecCol))
      .distinct()
    val scored = cand.select(col(qidCol), col(idCol),
      cosine(col(vecCol).cast("array<double>"), col(qvecCol).cast("array<double>")).as("sim"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold),
    * candidates restricted to shared LSH bands. */
  def nearDupPairs(corpus: DataFrame, threshold: Double, nBits: Int = 16,
                   bands: Int = 4, seed: Long = 42L,
                   idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    require(nBits % bands == 0)
    val r = nBits / bands
    val mask = (1L << r) - 1
    val sig = corpus.select(col(idCol), col(vecCol),
      rhpSignature(col(vecCol), nBits, seed).as("sig"))
    val banded = sig.select(col(idCol), col(vecCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftright", col("sig"), b * lit(r)).bitwiseAND(lit(mask)))))
      .toDF(idCol, "vec_", "band", "bucket")
    val l = banded.select(col("band"), col("bucket"), col(idCol).as("a"), col("vec_").as("va"))
    val rt = banded.select(col("band"), col("bucket"), col(idCol).as("b"), col("vec_").as("vb"))
    l.join(rt, Seq("band", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("va"), col("vb")).distinct()
      .select(col("a"), col("b"),
        cosine(col("va").cast("array<double>"), col("vb").cast("array<double>")).as("sim"))
      .where(col("sim") >= threshold)
  }
}
