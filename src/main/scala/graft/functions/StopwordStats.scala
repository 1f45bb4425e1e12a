package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the stopword-based text operators (language
  * ID, stopword-hit counting). The declarative formulations in
  * [[graft.text.TextOps]] (`filter(tokens(lower(text)), array_contains)`
  * per language) are higher-order functions — interpreted, no doGenCode —
  * and re-tokenize the text once per language; at sf0.1 that made q_langid
  * the headline set's only above-noise drifter (first-evaluation cost
  * 2.4–4 s, VERDICT r3 finding #2). The kernels do ONE pass over the
  * lowercased bytes, splitting on the space byte (exact `split(s, " ")`
  * semantics — UTF-8 multi-byte chars never contain 0x20) and looking each
  * token up in a static token→language-bitmask map. The HOF twins remain in
  * TextOps as spec cross-checks ([[graft.text.TextOps.langIdHof]] /
  * `stopwordRatioHof`, NativeFunctionsSpec parity cases).
  *
  * Lowercasing uses `UTF8String.toLowerCase` — the same call Spark's
  * `lower()` lowers through, so kernel and declarative twin see identical
  * tokens.
  */
case class StringLangId(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    StopwordKernel.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StopwordKernel.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): StringLangId =
    copy(child = newChild)
}

/** Count of tokens (duplicates included) that are a stopword of ANY
  * language — the numerator of TextOps.stopwordRatio. */
case class StopwordHitCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_hits"

  override protected def nullSafeEval(input: Any): Any =
    StopwordKernel.unionHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StopwordKernel.unionHits($c)")

  override protected def withNewChildInternal(newChild: Expression): StopwordHitCount =
    copy(child = newChild)
}

object StopwordKernel {
  /** Sorted language codes — index order is the tie-break order (argmax
    * count, tie to the lexicographically smallest code, matching the
    * `least(struct(-hits, lang))` declarative formulation and the DuckDB
    * oracle's `ORDER BY s DESC, lang ASC`). */
  private val langs: Array[String] = graft.text.TextOps.Stopwords.keys.toArray.sorted
  private val langsU: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  /** token -> bitmask of languages whose stopword list contains it. */
  private val masks: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    langs.zipWithIndex.foreach { case (l, i) =>
      graft.text.TextOps.Stopwords(l).foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = Option(m.get(k)).map(_.longValue).getOrElse(0L)
        m.put(k, prev | (1L << i))
      }
    }
    m
  }

  /** One-pass argmax-language over space-split tokens of lower(s). */
  def langId(s: UTF8String): UTF8String = {
    val counts = new Array[Int](langs.length)
    eachTokenMask(s) { mask =>
      var i = 0
      var m = mask
      while (m != 0L) {
        if ((m & 1L) != 0L) counts(i) += 1
        m >>>= 1
        i += 1
      }
    }
    var best = -1
    var bestC = 0
    var i = 0
    while (i < counts.length) {
      if (counts(i) > bestC) { bestC = counts(i); best = i } // ties keep the earlier (smaller) code
      i += 1
    }
    if (best < 0) und else langsU(best)
  }

  /** Count of tokens present in any language's list (duplicates counted). */
  def unionHits(s: UTF8String): Int = {
    var hits = 0
    eachTokenMask(s) { _ => hits += 1 }
    hits
  }

  /** Applies `f` to the language bitmask of every space-split token of
    * lower(s) that IS a stopword; non-stopword tokens are skipped. */
  private def eachTokenMask(s: UTF8String)(f: Long => Unit): Unit = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        if (i > start) { // stopwords are non-empty; skip "" tokens cheaply
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          val m = masks.get(tok)
          if (m != null) f(m.longValue)
        }
        start = i + 1
      }
      i += 1
    }
  }
}
