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
  * Two token-hash modes:
  *  - default (`portable = false`): token hash = `xxhash64(token)` (XXH64
  *    seed 42 over the token's UTF-8 bytes) — the fast in-flight sketch.
  *    Semantics are bit-identical to the declarative higher-order-function
  *    formulation in [[graft.dedup.Dedup.simhashHof]]; the spec
  *    cross-validates the two.
  *  - `portable = true`: token hash = first 8 bytes (big-endian) of
  *    `md5(token)` — a sketch any engine can recompute byte-for-byte
  *    (DuckDB: `('0x' || substr(md5(tok), 1, 16))::UBIGINT`), the right
  *    contract for sketches that get persisted and re-checked outside
  *    Spark. This is what lets the driver's DuckDB oracle hash-compare the
  *    q_simhash catalog row end-to-end.
  *
  * In both modes: sketch bit i set iff a strict majority of tokens have
  * hash bit i set. The native kernel exists because higher-order functions
  * are interpreted (no doGenCode), which made the fold ~2 ms/doc; the
  * imperative kernel is single-pass, hashing each token's bytes in place
  * (no copies: UTF-8 multi-byte chars never contain 0x20, so byte-splitting
  * on spaces is exact).
  */
case class SimHash64(child: Expression, portable: Boolean = false) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = if (portable) "simhash64_md5" else "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    if (portable) SimHashKernel.computePortable(input.asInstanceOf[UTF8String])
    else SimHashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "computePortable" else "compute"
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashKernel {
  private val md5TL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

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
        accumulate(counts, h)
        n += 1
        start = i + 1
      }
      i += 1
    }
    pack(counts, n)
  }

  /** [[compute]] with the portable md5 token hash: h = first 8 digest bytes,
    * big-endian (== the value of the first 16 hex chars of `md5(token)`). */
  def computePortable(s: UTF8String): Long = {
    val bytes = s.getBytes
    val md = md5TL.get()
    val counts = new Array[Int](64)
    var n = 0
    var start = 0
    var i = 0
    val len = bytes.length
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        md.update(bytes, start, i - start)
        val d = md.digest() // digest() resets the instance
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        accumulate(counts, h)
        n += 1
        start = i + 1
      }
      i += 1
    }
    pack(counts, n)
  }

  private def accumulate(counts: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      counts(b) += ((h >>> b) & 1L).toInt
      b += 1
    }
  }

  private def pack(counts: Array[Int], n: Int): Long = {
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}
