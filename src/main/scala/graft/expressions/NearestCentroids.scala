package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * The `nprobe` nearest IVF centroids of a vector by cosine (centroids are
 * pre-normalized, so dot == cosine), best-first with index tie-break —
 * the cell-assignment / probe primitive of the IVF ANN tier. One native
 * pass: vector read once, k dot products, partial selection of nprobe.
 */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Double]],
    nprobe: Int)
  extends UnaryExpression {

  require(nprobe >= 1 && nprobe <= centroids.length,
    s"nprobe must be in [1, ${centroids.length}], got $nprobe")

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"nearest_centroids requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      vec(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val k = centroids.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      val n = math.min(dim, cent.length)
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += vec(j) * cent(j)
        j += 1
      }
      dots(c) = dot
      c += 1
    }
    // selection of the nprobe best (k is small; simple selection is fine)
    val out = new Array[Any](nprobe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && (dots(c) > bestDot)) {
          best = c
          bestDot = dots(c)
        }
        c += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // the model rides as a referenced object; generated code calls the
    // same kernel the interpreted path uses
    val ref = ctx.addReferenceObj("nearestcentroidsExpr", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($a);")
  }

  /** Kernel shared by interpreted eval and generated code. */
  def kernel(v: Any): Any = nullSafeEval(v)

  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
  override def prettyName: String = "nearest_centroids"
}
