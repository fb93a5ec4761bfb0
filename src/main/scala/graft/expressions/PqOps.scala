package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels (Jegou, Douze, Schmid, "Product
 * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
 * compressed-vector ANN tier: a D-dim vector becomes M small codes
 * (one per D/M-dim subspace), and query-to-code similarity is a table
 * lookup (ADC, asymmetric distance computation) instead of a dot product
 * over raw floats.
 *
 * Why this matters at 100 TB: raw float32 embeddings at dim 768 are
 * 3 KB/vector; M=96, 256-centroid codebooks store the same vector in
 * 96 bytes (32x). The index that must be scanned per query batch shrinks
 * by the same factor, and the scan itself is M integer lookups + adds
 * per candidate instead of D multiply-adds.
 *
 * Shared conventions with the IVF tier (NearestCentroids): vectors are
 * L2-normalized inside the kernel, so inner product == cosine; all three
 * kernels are single-pass, codegen'd via the shared-kernel reference
 * pattern; ties in the sub-centroid argmin break to the LOWEST index, so
 * encoding is deterministic cross-run and cross-engine.
 */
private[graft] object PqKernels {

  /** Normalize an ArrayData vector (float or double elements) to unit L2. */
  def toUnitVec(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    val dim = arr.numElements()
    val vec = new Array[Double](dim)
    var i = 0
    var n = 0.0
    while (i < dim) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      vec(i) = x
      n += x * x
      i += 1
    }
    if (n > 0.0) {
      val inv = 1.0 / math.sqrt(n)
      i = 0
      while (i < dim) { vec(i) *= inv; i += 1 }
    }
    vec
  }
}

/**
 * Encode a vector to its M PQ codes: for each subspace, the index of the
 * L2-nearest sub-centroid (argmin ||x_m - c||^2 == argmax dot(x_m, c) -
 * ||c||^2/2; half-norms are precomputed once per codebook). Output:
 * ARRAY<INT> of length M, each code in [0, ks).
 */
case class PqEncode(
    child: Expression,
    codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode requires at least one non-empty codebook")

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"pq_encode requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // -||c||^2 / 2 per sub-centroid, folded into the argmax once
  @transient private lazy val halfNormBias: Array[Array[Double]] =
    codebooks.map(_.map { c =>
      var s = 0.0
      var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      -0.5 * s
    })

  override def nullSafeEval(v: Any): Any = kernel(v)

  def kernel(v: Any): Any = {
    val vec = PqKernels.toUnitVec(v.asInstanceOf[ArrayData], isFloat)
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    // fail fast, never clamp: a vector that does not match the model's
    // dimensionality would silently encode to garbage codes (an index
    // built with one embedding model scored under another)
    if (vec.length != m * dsub) {
      throw graft.GraftErrors.dimMismatch("pq_encode", "vector", vec.length, m, dsub)
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val bias = halfNormBias(s)
      val off = s * dsub
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dot = bias(c)
        var j = 0
        while (j < dsub) { dot += vec(off + j) * cent(j); j += 1 }
        if (dot > bestScore) { bestScore = dot; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeExpr", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/**
 * The per-query ADC lookup table: lut[s*ks + c] = dot(q_s, codebook[s][c])
 * over the unit-normalized query, flattened to ARRAY<DOUBLE> of length
 * M*ks. Computed ONCE per query row (M*ks*dsub mults), then every
 * candidate costs M lookups — this is the asymmetric half of ADC: the
 * query stays exact, only the candidate is quantized.
 */
case class PqLut(
    child: Expression,
    codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_lut requires at least one non-empty codebook")

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"pq_lut requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = kernel(v)

  def kernel(v: Any): Any = {
    val vec = PqKernels.toUnitVec(v.asInstanceOf[ArrayData], isFloat)
    val m = codebooks.length
    val ks = codebooks(0).length
    val dsub = codebooks(0)(0).length
    // same fail-fast as PqEncode: a clamped LUT would silently zero the
    // out-of-range subspaces and mis-rank every candidate
    if (vec.length != m * dsub) {
      throw graft.GraftErrors.dimMismatch("pq_lut", "query", vec.length, m, dsub)
    }
    val out = new Array[Any](m * ks)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val off = s * dsub
      var c = 0
      while (c < ks) {
        val cent = book(c)
        var dot = 0.0
        var j = 0
        while (j < dsub) { dot += vec(off + j) * cent(j); j += 1 }
        out(s * ks + c) = dot
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqLutExpr", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.kernel($a);")
  }

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
  override def prettyName: String = "pq_lut"
}

/**
 * ADC score of one quantized candidate against one query lookup table:
 * sum over subspaces of lut[s*ks + codes[s]] — approximately
 * cosine(query, candidate). ks is recovered from the array shapes
 * (lut.length / codes.length), so the same expression serves any model
 * size; a non-divisible pair is a runtime error, catching mismatched
 * model versions between the index and the query side.
 */
case class PqAdc(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => true
        case _ => false
      },
      "pq_adc requires (codes ARRAY<INT>, lut ARRAY<DOUBLE>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any =
    kernel(codesAny, lutAny)

  def kernel(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val total = lut.numElements()
    if (m == 0 || total % m != 0) {
      throw graft.GraftErrors.pqModelMismatch(
        s"lut length $total is not a multiple of code length $m " +
          "(index and query built from different PQ models?)")
    }
    val ks = total / m
    var s = 0
    var sum = 0.0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ks) {
        throw graft.GraftErrors.pqModelMismatch(
          s"code $c out of range [0, $ks) at subspace $s")
      }
      sum += lut.getDouble(s * ks + c)
      s += 1
    }
    sum
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcExpr", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ((Double) $ref.kernel($a, $b)).doubleValue();")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdc = copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}
