package graft.tools

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: `.explain("formatted")` dumps of representative
  * queries, the artifact backing the "is the plan the one you'd want"
  * review (filter pushdown, column pruning, codegen spans, exchange count).
  *
  * Usage: runMain graft.tools.DumpPlans [sfDir]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def planOf(name: String): String = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val bos = new ByteArrayOutputStream()
      Console.withOut(new PrintStream(bos, true, "UTF-8")) { df.explain("formatted") }
      bos.toString("UTF-8")
    }

    val sections = Seq(
      "q_edge_filter" -> ("Column pruning: the scan reads only (l_orderkey, l_partkey) " +
        "(`ReadSchema`) with join-key null filters pushed (`PushedFilters`); the weight " +
        "range filter applies right after the aggregate that derives weight — as early " +
        "as a derived-column predicate can run."),
      "q_edges_build" -> ("Co-occurrence self-join: one sort-merge/shuffled-hash equi-join " +
        "on the order key, partial-aggregated count; AQE picks the physical join."),
      "q_degree" -> ("Symmetrize (union) + one hash aggregate; map-side partial " +
        "combine keeps hub fan-in off the wire."),
      "q_token_stats" -> ("Narrow per-row text ops: single WholeStageCodegen span " +
        "over the scan, no exchange."),
      "q_simhash" -> ("Native codegen expression (simhash64) inside the codegen span + " +
        "one aggregate exchange for the grouping."),
      "q_exact_dedup" -> ("Dedup = groupBy on a computed key + self-join back; " +
        "both sides share one exchange (ReuseExchange)."),
      "q_ann_topk" -> ("Broadcast the query vectors; per-pair work is a single " +
        "dot-product pass (norms precomputed); bounded top-k via the typed " +
        "TopKAggregator (ObjectHashAggregate, partial-merged map-side — no window sort)."),
      "q_cluster_shape" -> ("Size renumbering WITHOUT a single-partition window: " +
        "range-partitioned sort + zipWithIndex (no `WindowExec: No Partition Defined` " +
        "anywhere in the plan or logs); the rank join back is a small-side join AQE " +
        "can broadcast."),
      "q_vertex_jaccard" -> ("Common neighbors of adjacent pairs via the degree-" +
        "oriented triangle enumeration — every middle vertex's out-degree is " +
        "O(sqrt(m)), so wedge generation is O(m^1.5) regardless of hub skew; all " +
        "equi-joins, partial-aggregated counts."),
      "q_top_users" -> ("Top-n compiles to TakeOrderedAndProject (per-partition " +
        "top-n + merge of n*P rows), then the dense rank is stamped on the n " +
        "survivors — no global sort, no unpartitioned window."),
      "q_ann_lsh" -> ("64-bit random-hyperplane signatures persisted once (projection-" +
        "collapse barrier), 8-bit band buckets with a size cap, candidates deduped on " +
        "8-byte ids before the vectors are joined back for exact rerank. The plane " +
        "matrix is an md5-derived literal (no per-row hashing) — cross-engine " +
        "reproducible, so the DuckDB oracle replays the bucketing exactly."),
      "q_ann_ivf" -> ("IVF probe: nearest-cell assignment and the nprobe cell choice " +
        "are the native NearestCell(s) codegen kernels — the centroid matrix is ONE " +
        "codegen reference object and the argmin a runtime loop, so the plan is O(1) " +
        "in nlist (the literal least() chain it replaced grew O(nlist x dim) and " +
        "would blow whole-stage codegen at production cell counts); candidates come " +
        "from a broadcast join on the 8-byte cell key (at scale: the index's " +
        "bucketing column, so probing = partition pruning), exact rerank via the " +
        "bounded TopKAggregator."),
      "q_ivf_cells" -> ("The inverted file: one narrow native-kernel argmin " +
        "projection + one partial-aggregated count per cell; no data-plane collect " +
        "(training's per-iteration centroid collect is nlist x dim model state)."),
      "q_contract" -> ("Graph contraction (page->host rollup shape): two equi-joins " +
        "of the edge table against the vertex->group mapping (AQE broadcasts the " +
        "mapping when it fits), then one partial-aggregated groupBy on the " +
        "contracted endpoints — no driver state, no windows."),
      "q_repetition" -> ("Within-doc repetition: explode bigrams, two " +
        "partial-aggregated hash rollups ((doc,ngram) then doc); ratios are narrow " +
        "projections over the final aggregate."),
      "q_contamination" -> ("Decontamination sweep: both sides explode to distinct " +
        "shingles; the benchmark side is a sliver of the corpus so AQE broadcasts " +
        "it; two-level partial-aggregated rollup per candidate doc."),
      "q_split" -> ("Deterministic split: a single narrow codegen projection " +
        "(md5 + conv + chained comparisons) — no exchange at all."),
      "q_neardup_clusters" -> ("Dedup-pipeline composition: LSH candidate pairs -> " +
        "exact-Jaccard verify -> small-star/large-star connected components -> left " +
        "join back to the corpus; the pair graph is tiny relative to the corpus, so " +
        "AQE broadcasts the component labels."),
      "q_truss" -> ("k-truss final round (the plan below is the converged edge " +
        "set's support recount): the degree-oriented wedge join bounds per-task " +
        "fan-out at O(sqrt(m)) neighbors, every stage an equi-join + partial " +
        "aggregate; the peeling loop re-plans this shape on a shrinking, " +
        "checkpoint-released edge set each round."),
      "q_tfidf" -> ("TF-IDF top-terms: explode is narrow; tf and df are two " +
        "partial-aggregated rollups; the df side is vocabulary-sized so AQE " +
        "broadcasts it; the top-k window partitions by doc_id — millions of tiny " +
        "partitions, never a global sort."),
      "q_salsa" -> ("SALSA final superstep (converged chains): each half-step is " +
        "one equi-join against the src-partitioned persisted edge table + one " +
        "map-side-combined sum — Θ(E) messages per iteration, no windows, no " +
        "driver round-trips inside the chain."),
      "q_degree_dist" -> ("Degree histogram: symmetrize union -> one per-vertex " +
        "partial-aggregated count -> one tiny bucket aggregate; the log2 bucket is " +
        "a narrow codegen projection (binary digit count, integer-exact)."),
      "q_vocab_stats" -> ("Vocabulary rollup: explode -> (lang,term) partial " +
        "hash aggregate -> ONE per-lang aggregate whose min_by argmax computes the " +
        "top term map-side-combined (round 6: no WindowExec, no per-language " +
        "vocabulary sort, no stats/top join anywhere in this plan)."))

    val md = new StringBuilder
    md.append("# PLANS — physical-plan evidence (`.explain(\"formatted\")`)\n\n")
    md.append(s"Generated by `runMain graft.tools.DumpPlans $sfDir` (testdata ${sfDir}).\n")
    md.append("Iterative operators (PageRank/CC/LPA) are driver loops — their\n")
    md.append("per-superstep plan shape is documented in BASELINE.md; everything\n")
    md.append("below is a single declarative plan.\n\n")
    sections.foreach { case (name, note) =>
      md.append(s"## $name\n\n$note\n\n```\n")
      md.append(planOf(name).trim)
      md.append("\n```\n\n")
    }
    Files.write(Paths.get("PLANS.md"), md.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plans] wrote PLANS.md (${sections.size} sections)")
    spark.stop()
  }
}
