package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-6 evidence for the SALSA/HITS dual-partitioning change: the
  * catalog query's `.explain` only shows the FINAL score join (the
  * iterations have already executed), so this tool rebuilds ONE
  * authority-chain iteration body over (a) a single src-partitioned
  * persisted edge table — the round-5 shape — and (b) the round-6 dual
  * src/dst-partitioned copies, and dumps both physical plans. The claim to
  * check: in (a) the dst-keyed join carries an Exchange over the Θ(E) edge
  * side every iteration; in (b) the edge side of every join is an
  * InMemoryTableScan whose persisted partitioning already matches the join
  * key (exchanges remain only on the Θ(V) score/degree tables).
  *
  * Usage: runMain graft.tools.DumpIterPlans [sfDir]
  */
object DumpIterPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      // broadcast joins would hide the partitioning question at toy scale
      // (every side fits under the threshold); at 100 TB the edge side is
      // never broadcastable, so dump the sort-merge/shuffled-hash shape the
      // cluster would actually plan.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def planOf(df: DataFrame): String = {
      val bos = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(bos, true, "UTF-8")) { df.explain("formatted") }
      bos.toString("UTF-8")
    }
    val outDir = Paths.get("plans/r06")
    Files.createDirectories(outDir)

    val edges = graft.Queries.edges(spark, sfDir)
      .select(col("src").cast("long"), col("dst").cast("long"))

    // shared Θ(V) inputs (built once, checkpointed like the operator does)
    def iterBody(eForDst: DataFrame, eForSrc: DataFrame): DataFrame = {
      val outd = eForSrc.groupBy(col("src").as("vertex")).agg(count(lit(1)).as("od"))
        .localCheckpoint(true)
      val ind = eForDst.groupBy(col("dst").as("vertex")).agg(count(lit(1)).as("id"))
        .localCheckpoint(true)
      val auth = ind.select(col("vertex"), lit(0.5).as("s")).localCheckpoint(true)
      val ca = auth.join(ind, "vertex").select(col("vertex").as("a"), (col("s") / col("id")).as("c"))
      val hc = eForDst.join(ca, eForDst("dst") === ca("a"))
        .groupBy(eForDst("src").as("h")).agg(sum(col("c")).as("hv"))
        .join(outd.select(col("vertex").as("h"), col("od")), "h")
        .select(col("h"), (col("hv") / col("od")).as("c"))
      eForSrc.join(hc, eForSrc("src") === hc("h"))
        .groupBy(eForSrc("dst").as("vertex")).agg(sum(col("c")).as("s"))
    }

    // (a) round-5 shape: ONE copy, partitioned on src only
    val eSrcOnly = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    eSrcOnly.count()
    Files.write(outDir.resolve("salsa_iteration_before.txt"),
      planOf(iterBody(eSrcOnly, eSrcOnly)).getBytes(StandardCharsets.UTF_8))
    eSrcOnly.unpersist(blocking = true)

    // (b) round-6 shape: dual copies, partitioned on src and on dst
    val eSrc = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val eDst = eSrc.repartition(col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    eDst.count()
    Files.write(outDir.resolve("salsa_iteration_after.txt"),
      planOf(iterBody(eDst, eSrc)).getBytes(StandardCharsets.UTF_8))
    eSrc.unpersist(blocking = false)
    eDst.unpersist(blocking = false)

    println("[iter-plans] wrote salsa_iteration_before.txt / salsa_iteration_after.txt")
    graft.Queries.clearCaches()
    spark.stop()
  }
}
