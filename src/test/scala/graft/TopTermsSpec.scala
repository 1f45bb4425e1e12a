package graft

import graft.text.TextOps

/** TF-IDF (linear idf) top-terms vs hand-computed scores. */
class TopTermsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    ("d1", "apple apple banana common"),
    ("d2", "banana cherry common common"),
    ("d3", "cherry cherry cherry common")).toDF("doc_id", "text")

  private def top(k: Int): Map[(String, Long), (String, Long, Double)] =
    TextOps.topTerms(docs, 3L, k).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap

  test("rare terms outrank common ones; scores are tf*N/df") {
    val t = top(2)
    // d1: apple tf=2 df=1 -> 6.0; banana tf=1 df=2 -> 1.5; common tf=1 df=3 -> 1.0
    assert(t(("d1", 1L)) == (("apple", 2L, 6.0)))
    assert(t(("d1", 2L)) == (("banana", 1L, 1.5)))
    // d3: cherry tf=3 df=2 -> 4.5 beats common tf=1 df=3 -> 1.0
    assert(t(("d3", 1L)) == (("cherry", 3L, 4.5)))
    assert(t(("d3", 2L)) == (("common", 1L, 1.0)))
  }

  test("ties break by term ascending") {
    // d2: banana tf=1 df=2 -> 1.5, cherry tf=1 df=2 -> 1.5 (tie), common tf=2 df=3 -> 2.0
    val t = top(3)
    assert(t(("d2", 1L)) == (("common", 2L, 2.0)))
    assert(t(("d2", 2L)) == (("banana", 1L, 1.5)))
    assert(t(("d2", 3L)) == (("cherry", 1L, 1.5)))
  }

  test("uppercase folds and repeated spaces produce no empty terms") {
    val messy = Seq(("m1", "Apple  APPLE zebra")).toDF("doc_id", "text")
    val rows = TextOps.topTerms(messy, 1L, 5).collect()
    assert(rows.map(_.getString(2)).toSet == Set("apple", "zebra"))
    assert(rows.find(_.getString(2) == "apple").get.getLong(3) == 2L)
  }
}
