package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `extract_hrefs(html: binary): array<string>` — anchor-target extraction
  * from raw page bytes as a native codegen expression.
  *
  * This is the one genuinely custom scalar operator the engine adds over the
  * reference's capability set (SURVEY.md §2.7: the reference receives its
  * edge table precomputed; we extract it from `html`). The expression form
  * keeps the scan → extract → explode → aggregate pipeline inside
  * whole-stage codegen with only the two projected columns read, where the
  * earlier typed-flatMap form forced a full Page encoder round-trip per row.
  *
  * Matches [[graft.ingest.LinkExtract.hrefs]] (regex `<a\s+href="([^"]+)"`)
  * byte-for-byte — the spec cross-validates the two extractors.
  */
case class ExtractHrefs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[BinaryType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "extract_hrefs"

  override protected def nullSafeEval(input: Any): Any =
    HrefKernel.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HrefKernel.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractHrefs =
    copy(child = newChild)
}

object HrefKernel {
  /** Imperative scan for `<a` WS+ `href="` ... `"`. Equivalent to the regex
    * `<a\s+href="([^"]+)"` (ASCII whitespace; UTF-8 multi-byte sequences
    * cannot alias the ASCII pattern bytes, so a byte scan is exact). */
  def extract(html: Array[Byte]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val n = html.length
    var i = 0
    while (i < n - 1) {
      if (html(i) == '<' && html(i + 1) == 'a') {
        var j = i + 2
        var ws = 0
        while (j < n && (html(j) == ' ' || html(j) == '\t' || html(j) == '\n' ||
          html(j) == '\r' || html(j) == '\f' || html(j) == 0x0b)) { ws += 1; j += 1 } // \s = [ \t\n\x0B\f\r]
        if (ws > 0 && j + 6 < n &&
          html(j) == 'h' && html(j + 1) == 'r' && html(j + 2) == 'e' &&
          html(j + 3) == 'f' && html(j + 4) == '=' && html(j + 5) == '"') {
          val start = j + 6
          var k = start
          while (k < n && html(k) != '"') k += 1
          if (k < n && k > start) { // [^"]+ requires non-empty
            out += UTF8String.fromString(
              new String(html, start, k - start, StandardCharsets.UTF_8))
            i = k // resume after the closing quote
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
