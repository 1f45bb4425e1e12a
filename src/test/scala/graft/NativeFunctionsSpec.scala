package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ingest.{LinkExtract, PageSynth}

/** Native codegen expressions vs their declarative/typed oracles:
  * bit-identical results, plus the SQL registration path. */
class NativeFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "completely different content entirely here now"),
    (4L, ""), // empty text: one empty token
    (5L, "a  b"), // double space: empty middle token
    (6L, "único café naïve 日本語 text")) // multi-byte UTF-8
  lazy val docs = texts.toDF("doc_id", "text")

  test("SimHash64 expression is bit-identical to the HOF formulation") {
    val got = docs.select($"doc_id", Dedup.simhash($"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = docs.select($"doc_id", Dedup.simhashHof($"text").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got(1L) == got(2L), "identical texts, identical sketch")
    assert(got(1L) != got(3L), "distinct texts, distinct sketch")
  }

  test("SimHash64 on the documents table matches HOF end-to-end") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = d.select(
        Dedup.simhash(col("text")).as("a"), Dedup.simhashHof(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("portable SimHash matches a plain-Scala MessageDigest reference") {
    def md5First8(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((h, k) => (h << 8) | (d(k) & 0xffL))
    }
    def reference(text: String): Long = {
      val hs = text.split(" ", -1).map(md5First8)
      (0 until 64).foldLeft(0L) { (sk, b) =>
        val c = hs.count(h => ((h >>> b) & 1L) == 1L)
        if (c * 2 > hs.length) sk | (1L << b) else sk
      }
    }
    val got = docs.select($"doc_id", Dedup.simhash($"text", portable = true).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == reference(t), s"doc $id")
    }
  }

  test("MinHash64 expression is bit-identical to the HOF formulation") {
    val shortAndLong = docs.unionByName(Seq(
      (7L, "one two"), // fewer tokens than shingleN: whole-text shingle
      (8L, "x")).toDF("doc_id", "text"))
    val got = shortAndLong.select($"doc_id", Dedup.minhashSignature($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expect = shortAndLong.select($"doc_id", Dedup.minhashSignatureHof($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == expect)
  }

  test("MinHash64 equals HOF on scalacheck-generated random token streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random words over a tiny alphabet + multi-byte chars, random
    // multiplicity of spaces (empty tokens), random token counts 0..12
    val textGen: Gen[String] = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "código", "日本", "", "x y".take(1)))
      seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  "))
    } yield toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString
    val cases = (0 until 60).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(7L + i)))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val diff = df.select(
        Dedup.minhashSignature($"text", k = 16).as("a"),
        Dedup.minhashSignatureHof($"text", k = 16).as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0L)
  }

  test("MinHash64 on the documents table matches HOF end-to-end") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = d.select(
        Dedup.minhashSignature(col("text")).as("a"),
        Dedup.minhashSignatureHof(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("ExtractHrefs expression matches the typed flatMap extractor exactly") {
    val pages = PageSynth.pages(spark, 500L, seed = 7L, numPartitions = 4)
    val a = LinkExtract.linkPairs(pages).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val b = LinkExtract.linkPairsTyped(pages).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("ExtractHrefs handles regex-equivalent edge cases") {
    val html = Seq(
      // tabs/newlines as \s+, empty href skipped ([^"]+), no-ws `<ahref` skipped,
      // unterminated quote skipped, multiple anchors per doc
      (1L, """<a href="u1"><a	href="u2"><a
        |href="u3"><a href=""><ahref="u4"><a href="u5""".stripMargin.getBytes("UTF-8")),
      (2L, """no anchors here""".getBytes("UTF-8")))
      .toDF("id", "html")
    val got = got2(html)
    val oracle = Seq(1L -> LinkExtract.hrefs(html.collect()(0).getAs[Array[Byte]]("html")).toList,
      2L -> Nil).toMap
    assert(got == oracle)
    // u4 (no whitespace before href) and u5 (unterminated quote) rejected
    assert(got(1L) == List("u1", "u2", "u3"))
  }

  private def got2(df: org.apache.spark.sql.DataFrame): Map[Long, List[String]] = {
    df.select(col("id"), graft.functions.extract_hrefs(col("html")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
  }

  test("StringLangId / StopwordHitCount kernels are identical to the HOF twins") {
    import graft.text.TextOps
    // mixed-language + edge-case corpus: ties (en+de words equal), overlap
    // tokens ("de" ∈ es∩fr must count once in the union), casing (lower()
    // parity), multi-space, empty, multi-byte
    val tricky = Seq(
      (1L, "the and of to DIE der und ist"),
      (2L, "de de de que la el"),
      (3L, "THE AND OF der die und"), // 3-3 tie -> lexicographically first lang
      (4L, ""), (5L, "a  b   the"), (6L, "único café the 日本語"),
      (7L, "xyzzy plugh nothing matches here")).toDF("doc_id", "text")
    val both = tricky.union(docs).select(
      TextOps.langId($"text").as("k"), TextOps.langIdHof($"text").as("h"),
      TextOps.stopwordRatio($"text").as("kr"), TextOps.stopwordRatioHof($"text").as("hr"))
    assert(both.where($"k" =!= $"h" || $"kr" =!= $"hr").count() == 0L)
    // und on zero hits, exact tie goes to the smaller code
    val m = tricky.select($"doc_id", TextOps.langId($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(7L) == "und" && m(4L) == "und")
    assert(m(3L) == "de" || m(3L) == "en") // whichever, must equal the HOF (checked above)
  }

  test("SQL registration path: simhash64/extract_hrefs callable from SQL") {
    graft.functions.registerAll(spark)
    docs.createOrReplaceTempView("nf_docs")
    val viaSql = spark.sql("SELECT doc_id, simhash64(text) AS s FROM nf_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = docs.select($"doc_id", Dedup.simhash($"text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
    val n = spark.sql(
      "SELECT count(*) FROM (SELECT explode(extract_hrefs(CAST('<a href=\"x\">' AS BINARY))))")
      .head().getLong(0)
    assert(n == 1L)
  }
}
