package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Random-hyperplane LSH bucket ids for a vector, all tables in one pass:
 * bit i of table t is the sign of dot(vec, planes(t)(i)); the bucket id is
 * the bit pattern tagged with the table index in the high 32 bits.
 *
 * One native expression instead of `tables * bitsPerTable` interpreted
 * `aggregate(zip_with(...))` folds — the plane matrix rides inside the
 * expression (seeded, deterministic), the vector is read once.
 */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"hyperplane_buckets requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
    val out = new Array[Any](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var bucket = 0L
      var b = 0
      while (b < table.length) {
        val plane = table(b)
        val n = math.min(dim, plane.length)
        var dot = 0.0
        var j = 0
        while (j < n) {
          dot += vec(j) * plane(j)
          j += 1
        }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket | (t.toLong << 32)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // the model rides as a referenced object; generated code calls the
    // same kernel the interpreted path uses
    val ref = ctx.addReferenceObj("hyperplanebucketsExpr", this,
      classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($a);")
  }

  /** Kernel shared by interpreted eval and generated code. */
  def kernel(v: Any): Any = nullSafeEval(v)

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
  override def prettyName: String = "hyperplane_buckets"
}
