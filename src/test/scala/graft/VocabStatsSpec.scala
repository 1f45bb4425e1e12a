package graft

import graft.text.TextOps

/** vocabStats vs hand-computed vocabulary facts, incl. the top-term
  * tie-break and hapax counting. */
class VocabStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed per-language vocabulary stats") {
    val docs = Seq(
      ("en", "the cat sat on the mat"),   // the:2 cat:1 sat:1 on:1 mat:1
      ("en", "the dog"),                  // the:3 total; dog:1
      ("fr", "le le la"),                 // le:2 la:1
      ("fr", "la le")                     // le:3 la:2
    ).toDF("lang", "text")
    val got = TextOps.vocabStats(docs).orderBy("lang")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5), r.getDouble(6)))
      .toMap
    // en: terms {the:3, cat:1, sat:1, on:1, mat:1, dog:1} -> 6 distinct, 8 tokens, 5 hapax
    assert(got("en") == ((6L, 8L, 5L, "the", 3L, 0.375)))
    // fr: {le:3, la:2} -> 2 distinct, 5 tokens, 0 hapax, top le 3/5
    assert(got("fr") == ((2L, 5L, 0L, "le", 3L, 0.6)))
  }

  test("top-term ties break lexicographically") {
    val docs = Seq(("xx", "bb aa"), ("xx", "aa bb")).toDF("lang", "text")
    val row = TextOps.vocabStats(docs).collect().head
    assert(row.getString(4) == "aa" && row.getLong(5) == 2L)
  }

  test("empty tokens are dropped (double spaces do not mint terms)") {
    val docs = Seq(("yy", "a  b")).toDF("lang", "text")
    val row = TextOps.vocabStats(docs).collect().head
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L)
  }
}
