package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for vector math.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*),0,+)`)
  * is evaluated interpretively per element — at 4M candidate pairs × 64
  * dims that dominated the ANN benchmarks. `DotProduct` generates a tight
  * Java loop inside WholeStageCodegen instead (~20× on the brute-force
  * cosine tier at sf0.1). The fold is left-to-right, bit-identical to both
  * the interpreted form and DuckDB's list_sum, so oracle parity holds.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dots of one vector column against every row of a CONSTANT matrix,
  * as array<double>: out[j] = Σ_i v[offset+i]·mat[j][i].
  *
  * One expression per matrix replaces `mat.length` sibling DotProduct
  * expressions. That matters beyond per-row cost: a whole-stage-codegen'd
  * Project never splits its consume path into submethods, so the PQ
  * tier's 8 LUT columns × 16 codebook entries = 128 inline dot loops
  * blew Janino's 64 KB method limit and silently dropped the stage to
  * interpreted execution. This generates one tight double[][] loop per
  * column. The inner fold is left-to-right, bit-identical to DotProduct.
  */
case class MatVecDots(child: Expression, mat: Array[Array[Double]],
    offset: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def dotRow(v: ArrayData, row: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < row.length) { s += v.getDouble(offset + i) * row(i); i += 1 }
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) { out(j) = dotRow(v, mat(j)); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("mat", mat, "double[][]")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |double[] $out = new double[$m.length];
         |for (int $j = 0; $j < $m.length; $j++) {
         |  double[] $row = $m[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $row.length; $i++) {
         |    $s += $v.getDouble($offset + $i) * $row[$i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Index j maximizing  Σ_i v[offset+i]·w[j][i] − scale·cd[j][idx] − h[j],
  * ties resolved to the LARGEST j (the ordering `sort_array desc` over
  * (score, j) structs produced, which this replaces).
  *
  * This is PQ encoding as one expression: argmin_j ‖sub − e_j‖² ⇔ this
  * argmax with w = the (possibly rotation-pulled-back) codebook entries,
  * cd[j][cluster] = dot(centroid_cluster slice, e_j) (the residual
  * correction — plan-time constants), h[j] = ‖e_j‖²/2. The previous
  * per-entry expression form (16 dots + 16 structs + a sort per subspace,
  * ×8 subspaces in ONE Project) exceeded the 64 KB codegen method limit;
  * this emits one ~20-line loop per subspace with identical arithmetic
  * order, so encodings are bit-identical to the expression form.
  */
case class ArgMaxAffineDots(first: Expression, second: Expression,
    third: Expression, w: Array[Array[Double]], cd: Array[Array[Double]],
    h: Array[Double], offset: Int) extends TernaryExpression {
  require(cd.length == w.length && h.length == w.length,
    s"cd/h must have one row per codebook entry (${w.length})")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val idx = c.asInstanceOf[Int]
    var best = 0
    var bestS = Double.NegativeInfinity
    var j = 0
    while (j < w.length) {
      val row = w(j)
      var s = 0.0
      var i = 0
      while (i < row.length) { s += v.getDouble(offset + i) * row(i); i += 1 }
      s = s - scale * cd(j)(idx) - h(j)
      if (s >= bestS) { bestS = s; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, scale, idx) => {
      val wm = ctx.addReferenceObj("w", w, "double[][]")
      val cdm = ctx.addReferenceObj("cd", cd, "double[][]")
      val hv = ctx.addReferenceObj("h", h, "double[]")
      val row = ctx.freshName("row")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      s"""
         |int $best = 0;
         |double $bestS = Double.NEGATIVE_INFINITY;
         |for (int $j = 0; $j < $wm.length; $j++) {
         |  double[] $row = $wm[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $row.length; $i++) {
         |    $s += $v.getDouble($offset + $i) * $row[$i];
         |  }
         |  $s = $s - $scale * $cdm[$j][$idx] - $hv[$j];
         |  if ($s >= $bestS) { $bestS = $s; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExpressions {
  /** Column-API surface: dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Dots of `v` (from `offset`) against each row of a constant matrix. */
  def matVecDots(v: Column, mat: Array[Array[Double]],
      offset: Int = 0): Column =
    ColumnShim.column(MatVecDots(ColumnShim.expression(v), mat, offset))

  /** argmax_j dot(v[offset..], w(j)) − scale·cd(j)(idx) − h(j); ties → largest j. */
  def argMaxAffineDots(v: Column, scale: Column, idx: Column,
      w: Array[Array[Double]], cd: Array[Array[Double]], h: Array[Double],
      offset: Int = 0): Column =
    ColumnShim.column(ArgMaxAffineDots(ColumnShim.expression(v),
      ColumnShim.expression(scale.cast("double")),
      ColumnShim.expression(idx.cast("int")), w, cd, h, offset))
}
