package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** IVF coarse-quantizer cell assignment as a native codegen expression:
  * argmin over the centroid matrix of the squared L2 distance to the input
  * vector, ties to the LOWER cell id.
  *
  * Why an expression and not a `least()` chain: the declarative formulation
  * (`least` over nlist `(dist, cell)` structs, each an O(dim) fold —
  * [[graft.sim.Ivf.cellOfLiteral]]) builds an O(nlist × dim) expression
  * TREE. Fine at nlist = 8; at production nlist (4k–64k cells for a 100 TB
  * corpus) whole-stage codegen blows the 64 KB JVM method limit, falls back
  * to interpreted, and plan compile time explodes. Here the centroid matrix
  * rides along as ONE codegen reference object and the argmin is a runtime
  * loop — plan size O(1) in nlist, no shuffle (the broadcast-join +
  * per-row-argmin alternative would re-shuffle the corpus), stays inside
  * whole-stage codegen.
  *
  * Bit-parity with the literal path (spec-enforced at nlist = 256,
  * IvfSpec): squared distance accumulates in ascending index order (same
  * IEEE sums), cells are scanned in ascending id order with a strict `<`
  * (same tie-break as struct least()), and a vector with mismatched length
  * or a null element yields null (the zip_with/aggregate null propagation).
  */
case class NearestCell(child: Expression, cells: Array[Int], mat: Array[Array[Double]])
    extends UnaryExpression {
  require(cells.length == mat.length && cells.nonEmpty, "one id per centroid")
  require(cells.sameElements(cells.sorted), "cell ids must be ascending (tie-break order)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  override protected def nullSafeEval(input: Any): Any =
    IvfKernel.nearestCell(input.asInstanceOf[ArrayData], cells, mat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("cell")
      s"""
         |Integer $boxed = graft.functions.IvfKernel.nearestCell($c, $cellsRef, $matRef);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** The `nprobe` nearest cells (by squared L2, then cell id) as
  * array<long> — the query-side probe list of the IVF search, same O(1)
  * plan-size rationale as [[NearestCell]]. Matches
  * `slice(array_sort(structs), 1, nprobe).cell`: full (d asc, cell asc)
  * order, truncated to min(nprobe, ncells); null on dim mismatch/null
  * element. */
case class NearestCells(child: Expression, cells: Array[Int],
                        mat: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  require(cells.length == mat.length && cells.nonEmpty, "one id per centroid")
  require(cells.sameElements(cells.sorted), "cell ids must be ascending (tie-break order)")
  require(nprobe >= 1, "nprobe >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    IvfKernel.nearestCells(input.asInstanceOf[ArrayData], cells, mat, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("probes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.IvfKernel.nearestCells($c, $cellsRef, $matRef, $nprobe);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object IvfKernel {

  /** @return boxed cell id, or null on dim mismatch / null element (the
    *         declarative zip_with/aggregate null-propagation parity). */
  def nearestCell(v: ArrayData, cells: Array[Int], mat: Array[Array[Double]]): Integer = {
    val dists = sqDists(v, mat)
    if (dists == null) return null
    var best = 0
    var i = 1
    while (i < dists.length) {
      if (dists(i) < dists(best)) best = i // ascending scan: ties keep lower cell
      i += 1
    }
    Integer.valueOf(cells(best))
  }

  def nearestCells(v: ArrayData, cells: Array[Int], mat: Array[Array[Double]],
                   nprobe: Int): ArrayData = {
    val dists = sqDists(v, mat)
    if (dists == null) return null
    val m = math.min(nprobe, cells.length)
    // partial selection sort — nprobe is small (typically <= 64)
    val idx = Array.range(0, cells.length)
    var s = 0
    while (s < m) {
      var best = s
      var i = s + 1
      while (i < idx.length) {
        // (d asc, cell asc) — swaps perturb idx order, so the tie-break must
        // compare cell ids explicitly to match array_sort on (d, cell)
        val better = dists(idx(i)) < dists(idx(best)) ||
          (dists(idx(i)) == dists(idx(best)) && cells(idx(i)) < cells(idx(best)))
        if (better) best = i
        i += 1
      }
      val t = idx(s); idx(s) = idx(best); idx(best) = t
      s += 1
    }
    val out = new Array[Long](m)
    var j = 0
    while (j < m) { out(j) = cells(idx(j)).toLong; j += 1 }
    new GenericArrayData(out)
  }

  /** Squared L2 distances to every centroid, ascending-index accumulation
    * (IEEE-identical to the aggregate/zip_with fold); null on any
    * irregularity the declarative path would null out. */
  private def sqDists(v: ArrayData, mat: Array[Array[Double]]): Array[Double] = {
    val n = v.numElements()
    var j = 0
    while (j < n) { if (v.isNullAt(j)) return null; j += 1 }
    val dists = new Array[Double](mat.length)
    var c = 0
    while (c < mat.length) {
      val row = mat(c)
      if (row.length != n) return null
      var sum = 0.0
      var i = 0
      while (i < n) { val d = v.getDouble(i) - row(i); sum += d * d; i += 1 }
      dists(c) = sum
      c += 1
    }
    dists
  }
}
