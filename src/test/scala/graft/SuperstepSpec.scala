package graft

import org.apache.spark.sql.functions._

import graft.core.Superstep

/** Regression guard for the loop-state statistics blowup: plain
  * localCheckpoint copies the pre-checkpoint plan's estimated sizeInBytes
  * into the truncated plan, so a loop whose state feeds k places compounds
  * the estimate to (2^63)^(k^step) and stats estimation eventually pins the
  * driver in million-digit BigInteger math. Superstep.checkpoint must keep
  * the estimate flat across passes. */
class SuperstepSpec extends SparkTestBase {

  test("loop-state checkpoint resets inherited statistics") {
    var comm = spark.range(10).toDF("v").localCheckpoint(true)
    for (_ <- 1 to 8) {
      val a = comm.select(col("v").as("a"))
      val joined = a
        .join(comm.select(col("v").as("b")), col("a") === col("b"))
        .join(comm.select(col("v").as("c")), col("a") === col("c"))
        .select(col("a").as("v"))
      val next = Superstep.checkpoint(joined)
      next.count()
      comm = next
    }
    val bits = comm.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    // with inherited stats this is ~3^8 * 63 ≈ 413k bits; reset keeps it flat
    assert(bits < 128, s"sizeInBytes bitLength = $bits — stats are compounding again")
    assert(comm.count() == 10L)
  }
}
