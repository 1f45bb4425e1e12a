package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature as a native codegen expression: bit p of
  * the result = sign (>= 0) of the projection of the input vector onto
  * literal plane p. The ±1 plane matrix (nBits × dim, md5-derived — see
  * [[graft.sim.Similarity.rhpPlanes]]) rides along as a codegen reference
  * object, so the hot loop is a plain fused multiply-add over primitive
  * arrays — no per-row hashing, no interpreted higher-order functions.
  *
  * Bit-identical to the declarative fold ([[graft.sim.Similarity
  * .rhpSignatureHof]], kept as the spec cross-check): the projection is the
  * same ascending-index left-fold sum, and a vector whose length differs
  * from the plane dimension (or that contains a null element) yields a null
  * projection in the HOF — reproduced here as bit 0 for every plane.
  * Input must be array<double> (callers cast).
  */
case class RhpSignature64(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64, "1..64 planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_signature64"

  override protected def nullSafeEval(input: Any): Any =
    RhpKernel.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.RhpKernel.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSignature64 =
    copy(child = newChild)
}

object RhpKernel {
  def compute(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val n = v.numElements()
    // HOF-parity guard: length mismatch or null element => null projections
    // => every sign test is false => signature 0 for those planes
    var hasNull = false
    var j = 0
    while (j < n && !hasNull) { hasNull = v.isNullAt(j); j += 1 }
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      if (!hasNull && row.length == n) {
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
        if (s >= 0.0) sig |= (1L << p)
      }
      p += 1
    }
    sig
  }
}
