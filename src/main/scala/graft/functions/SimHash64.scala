package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a space-tokenized string as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Semantics are bit-identical to the declarative higher-order-function
  * formulation in [[graft.dedup.Dedup.simhashHof]] (token hash =
  * `xxhash64(token)`, i.e. XXH64 seed 42 over the token's UTF-8 bytes;
  * sketch bit i set iff a strict majority of tokens have hash bit i set) —
  * the spec cross-validates the two. The native kernel exists because
  * higher-order functions are interpreted (no doGenCode), which made the
  * fold ~2 ms/doc; the imperative kernel is ~10 µs/doc and single-pass,
  * hashing each token's bytes in place (no copies: UTF-8 multi-byte chars
  * never contain 0x20, so byte-splitting on spaces is exact).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashKernel {
  /** Single-pass SimHash over space-separated tokens of `s`.
    * Matches `split(s, " ")` semantics exactly: consecutive spaces yield
    * empty tokens (which still hash), like the regex split in TextOps. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes // cheap: returns the backing array when compact
    val counts = new Array[Int](64)
    var n = 0
    var start = 0
    var i = 0
    val len = bytes.length
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        n += 1
        start = i + 1
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}
