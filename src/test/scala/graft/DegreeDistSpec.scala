package graft

import org.apache.spark.sql.functions._

/** The log2 bucketing must be integer-exact, in particular AT powers of two
  * where floor(log2(double)) is one ulp from wrong. */
class DegreeDistSpec extends SparkTestBase {
  import spark.implicits._

  test("binary-digit-count bucketing is exact at and around powers of two") {
    val degrees = Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L, 15L, 16L, 17L, 1023L, 1024L, 1025L)
    val got = degrees.toDF("degree")
      .select(col("degree"), (length(conv(col("degree"), 10, 2)) - 1).cast("long").as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    degrees.foreach { d =>
      val want = (63 - java.lang.Long.numberOfLeadingZeros(d)).toLong
      assert(got(d) == want, s"degree $d")
      // the bucket's [lo, hi] range actually contains the degree
      assert((1L << want) <= d && d < (1L << (want + 1)))
    }
  }

  test("histogram counts every vertex exactly once") {
    // star K1,5: center degree 5 (bucket 2), five leaves degree 1 (bucket 0)
    val e = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val deg = e.select(col("src").as("vertex")).unionAll(e.select(col("dst").as("vertex")))
      .groupBy("vertex").agg(count(lit(1)).as("degree"))
    val hist = deg.select((length(conv(col("degree"), 10, 2)) - 1).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(0L -> 5L, 2L -> 1L))
  }
}
