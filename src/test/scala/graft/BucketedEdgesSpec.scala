package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedEdges

/** Bucketed-table co-location: groupBy and equi self-join on the bucketing
  * key must produce exchange-free physical plans, and results must equal
  * the unbucketed formulations. */
class BucketedEdgesSpec extends SparkTestBase {
  import spark.implicits._

  private val edges = (0 until 500).flatMap { i =>
    Seq((i.toLong % 50, (i * 7 % 90).toLong + 100, 1.0 + i % 3),
      ((i * 13 % 60).toLong, (i * 11 % 70).toLong + 200, 2.0))
  }.toDF("src", "dst", "weight")

  test("bucketed groupBy(src) and self-join on src are exchange-free and correct") {
    BucketedEdges.write(edges, "bedges_test", buckets = 8)
    try {
      val deg = BucketedEdges.degrees(spark, "bedges_test")
      assert(!BucketedEdges.hasShuffle(deg), "degree over bucketed table shuffled")
      val expectDeg = edges.groupBy(col("src").as("vertex"))
        .agg(count(lit(1)).cast("long").as("degree"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotDeg = deg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDeg == expectDeg)

      val sj = BucketedEdges.selfJoinOnSrc(spark, "bedges_test")
      assert(!BucketedEdges.hasShuffle(sj), "self-join on bucketing key shuffled")
      val expectSj = edges.select(col("src"), col("dst").as("dst_l"))
        .join(edges.select(col("src"), col("dst").as("dst_r")), "src")
        .where(col("dst_l") < col("dst_r")).count()
      assert(sj.count() == expectSj)

      // control: the same aggregation over the unbucketed frame DOES shuffle
      val unbucketed = spark.table("bedges_test")
        .repartition(8) // destroys the bucketing-derived distribution
        .groupBy("src").agg(count(lit(1)))
      assert(BucketedEdges.hasShuffle(unbucketed))
    } finally spark.sql("DROP TABLE IF EXISTS bedges_test")
  }
}
