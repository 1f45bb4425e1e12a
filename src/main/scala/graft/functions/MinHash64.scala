package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-wide MinHash signature of a space-tokenized string as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Semantics are bit-identical to the declarative formulation in
  * [[graft.dedup.Dedup.minhashSignatureHof]]: shingles are `shingleN`
  * consecutive tokens joined by a single space (texts with fewer than
  * `shingleN` tokens yield one whole-text shingle); signature element j =
  * min over shingles of `xxhash64(shingle, j)` (Spark's multi-arg xxhash64:
  * seed 42, byte hash of the shingle, then hashInt(j) chained on it). The
  * spec cross-validates the two formulations.
  *
  * Why native: the fold is a higher-order function (interpreted, no
  * doGenCode) and the shingle strings are rebuilt per row per band
  * downstream. The kernel is single-pass and ZERO-copy: because tokens come
  * from a single-space split, the joined shingle string is exactly the
  * original byte span from the first token's start to the last token's end
  * — so each shingle is hashed in place with one byte pass plus k cheap
  * hashInt mixes, and no shingle string is ever materialized.
  */
case class MinHash64(child: Expression, k: Int = 32, shingleN: Int = 3)
    extends UnaryExpression {
  require(k > 0 && shingleN > 0, "k and shingleN must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.compute($c, $k, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

object MinHashKernel {
  /** Single-pass k-wide MinHash over the `n`-token shingles of `s`.
    * Matches `split(s, " ")` semantics (consecutive spaces yield empty
    * tokens); UTF-8 multi-byte chars never contain 0x20, so byte scanning
    * is exact. */
  def compute(s: UTF8String, k: Int, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val acc = new Array[Long](k)
    java.util.Arrays.fill(acc, Long.MaxValue)

    // circular buffer of the last n token start offsets
    val starts = new Array[Int](n)
    var tokens = 0
    var tokStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        starts(tokens % n) = tokStart
        tokens += 1
        if (tokens >= n) {
          // shingle = tokens [tokens-n, tokens): original bytes span
          // [starts((tokens-n) % n), i) — the join separator IS the split
          // separator, so the joined string equals the in-place span
          hashSpan(bytes, starts((tokens - n) % n), i, acc, k)
        }
        tokStart = i + 1
      }
      i += 1
    }
    if (tokens < n) hashSpan(bytes, 0, len, acc, k) // whole-text shingle
    UnsafeArrayData.fromPrimitiveArray(acc)
  }

  private def hashSpan(bytes: Array[Byte], start: Int, end: Int,
                       acc: Array[Long], k: Int): Unit = {
    val base = XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
    var j = 0
    while (j < k) {
      val h = XXH64.hashInt(j, base)
      if (h < acc(j)) acc(j) = h
      j += 1
    }
  }
}
