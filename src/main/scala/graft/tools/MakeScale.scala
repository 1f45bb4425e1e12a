package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a driver testdata directory: writes
  * `factor` key-shifted copies of each table (self-similar scaling — the
  * standard way to stress a fixed pipeline at k× the rows without new
  * source data; the BASELINE.json input hint mandates synthesizing scale
  * locally). Key columns are shifted by k·(max+1) per copy so the copies
  * are disjoint: the link graph becomes `factor` disjoint isomorphic
  * components, user sessions never merge across copies, and doc/vector ids
  * stay unique. Payload columns (text, embeddings, timestamps) are kept
  * IDENTICAL across copies on purpose — a scaled web corpus is exactly
  * where massive exact-duplicate groups appear, so the dedup/LSH family
  * gets a realistic skew stress (every doc gains factor−1 exact clones)
  * rather than a sanitized one.
  *
  * Usage: runMain graft.tools.MakeScale <srcSfDir> <outDir> <factor>
  * (e.g. /root/testdata/sf0.1 /tmp/sf1 10 → a ~6M-lineitem sf1 tier).
  */
object MakeScale {

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (table, key columns to shift). Non-key columns are copied verbatim.
    val shifts: Seq[(String, Seq[String])] = Seq(
      "lineitem" -> Seq("l_orderkey", "l_partkey"),
      "orders" -> Seq("o_orderkey"),
      "part" -> Seq("p_partkey"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "events" -> Seq("event_id", "user_id"),
      // dimension tables: copied once, unshifted (queries only key on the
      // fact-side ids; region/nation/customer/supplier are unused by the
      // headline set but kept so the dir is a drop-in sfDir)
      "customer" -> Nil, "supplier" -> Nil, "nation" -> Nil, "region" -> Nil)

    shifts.foreach { case (name, keys) =>
      val df = spark.read.parquet(s"$src/$name.parquet")
      val scaled =
        if (keys.isEmpty || factor == 1) df
        else {
          val bases: Map[String, Long] = keys.map { c =>
            c -> (df.agg(max(col(c))).head().getLong(0) + 1L)
          }.toMap
          (0 until factor).map { k =>
            keys.foldLeft(df) { case (d, c) =>
              d.withColumn(c, col(c) + lit(k * bases(c)))
            }
          }.reduce(_ unionByName _)
        }
      val parts = if (keys.isEmpty) 1 else cpus.toInt
      scaled.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[makescale] $name -> $out/$name.parquet x$factor")
    }
    spark.stop()
  }
}
