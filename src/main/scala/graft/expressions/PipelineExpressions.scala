package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * 64-bit SimHash of a token array: each token is hashed (xxHash64-style
 * 64-bit avalanche of the UTF-8 bytes); bit b of the result is 1 iff the
 * sum over tokens of (+1 when token-hash bit b set, else -1) is positive.
 * Near-duplicate docs differ in few bits (compare with `bit_count(a ^ b)`).
 *
 * Custom Expression because 64 per-bit counters can't be composed from
 * built-in functions; CodegenFallback keeps it a black-box call inside the
 * surrounding codegen'd projection (same standing as any hash UDF, but
 * operating on UTF8String bytes with zero boxing).
 */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }, s"simhash64 requires ARRAY<STRING> of tokens, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SimHash64.simhash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SimHash64.simhash($a);")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Core kernel, shared by interpreted eval and generated code (static
    * forwarder makes it callable from codegen'd Java). */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fmix64(arr.getUTF8String(i).hashCode.toLong * 0x9E3779B97F4A7C15L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** MurmurHash3-style 64-bit finalizer (public-domain avalanche step). */
  private def fmix64(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33
    h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }
}

/**
 * Unicode text normalization for corpus cleanup (the C4/CCNet-style first
 * pass): NFC canonical composition (java.text.Normalizer — e + COMBINING
 * ACUTE becomes the single é codepoint, so visually-identical strings
 * hash, dedup and tokenize identically), then strip the control
 * characters that survive in scraped text (C0 except tab/newline, DEL;
 * \r is stripped AFTER normalization so \r\n collapses to \n). Engine-
 * replayable: DuckDB spells the identical pipe as
 * `regexp_replace(nfc_normalize(text), '[\x00-\x08\x0b-\x1f\x7f]', '', 'g')`
 * — both implement Unicode canonical composition per the standard.
 *
 * Custom Expression (with codegen) rather than a UDF: the kernel calls a
 * JDK static and returns through UTF8String with no Row boxing, and
 * `doGenCode` keeps the surrounding projection inside whole-stage
 * codegen. ASCII-only strings (the overwhelming majority of a web
 * corpus) short-circuit: a single byte scan proves there is nothing to
 * normalize or strip and returns the input UTF8String unchanged — no
 * String materialization at all on that path.
 */
case class NormalizeText(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"normalize_text requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NormalizeText.normalize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.NormalizeText.normalize($a);")

  override protected def withNewChildInternal(c: Expression): NormalizeText = copy(child = c)
  override def prettyName: String = "normalize_text"
}

object NormalizeText {

  /** Core kernel, shared by interpreted eval and generated code. */
  def normalize(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    // fast path: pure ASCII with no strippable control bytes is already
    // NFC-normal — return the input buffer untouched
    val nb = u.numBytes()
    var i = 0
    var clean = true
    while (clean && i < nb) {
      val b = u.getByte(i) & 0xFF
      if (b >= 0x80 || b == 0x7F || (b < 0x20 && b != '\t' && b != '\n')) clean = false
      i += 1
    }
    if (clean) return u

    val nfc = java.text.Normalizer.normalize(u.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var j = 0
    while (j < nfc.length) {
      val c = nfc.charAt(j)
      if (!(c == '\u007F' || (c < ' ' && c != '\t' && c != '\n'))) sb.append(c)
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
}

/**
 * MinHash signature: element k is the minimum over the input strings of
 * `xxhash64(s, seed, k)` — BIT-IDENTICAL to the composed built-in spelling
 * `array_min(transform(arr, s => xxhash64(s, lit(seed), lit(k))))` (the
 * per-element chain is Spark's: hashUTF8String(s, 42) -> hashLong(seed) ->
 * hashInt(k)), but computed in ONE pass: the string hash and seed fold are
 * per-element work shared across all k, so `numHashes` array traversals
 * and their intermediate allocations collapse into `numHashes` cheap
 * hashInt finishes per element.
 *
 * Empty input yields an all-null array, mirroring `array_min(empty) = null`.
 */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
  extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }, s"minhash_signature requires ARRAY<STRING>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.MinHashSignature.compute($a, $numHashes, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  /** Core kernel, shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // per-element prefix of Spark's xxhash64(s, seed, k) chain. A null
      // element is hashed the way the composed spelling hashes it: Spark's
      // hash expressions SKIP a null child, leaving the initial 42 seed —
      // so the element still contributes hashInt(k, hashLong(seed, 42)).
      val base =
        if (arr.isNullAt(i)) XXH64.hashLong(seed, 42L)
        else XXH64.hashLong(seed, XXH64.hashUTF8String(arr.getUTF8String(i), 42L))
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashInt(k, base)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/**
 * Cosine similarity of two numeric vectors (array<float> or array<double>),
 * accumulated strictly left-to-right in double precision so results are
 * deterministic and engine-comparable. Returns 0.0 for zero-norm vectors;
 * null if either side is null. Mismatched lengths error.
 */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(isVec(left.dataType) && isVec(right.dataType),
      s"cosine_sim requires two ARRAY<FLOAT|DOUBLE>, got (${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"cosine_sim: vector length mismatch ($n vs ${y.numElements()})")
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi: Double = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi: Double = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Whole-stage-codegen body: the same strictly-sequential double loop as
    * the interpreted path (results must stay bit-identical). */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (leftIsFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: vector length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs in a
  * min-heap (worst on top). Mergeable, compactly serializable. */
final class TopKState(val k: Int) {
  // worst-first ordering: lower score first; on ties, larger id first
  val heap = new java.util.PriorityQueue[(Double, Long)](math.max(1, k),
    new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    })

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) {
      heap.add((score, id))
    } else {
      val worst = heap.peek()
      if (score > worst._1 || (score == worst._1 && id < worst._2)) {
        heap.poll()
        heap.add((score, id))
      }
    }
  }

  def merge(other: TopKState): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      insert(s, i)
    }
  }

  /** Best-first (score desc, id asc). */
  def sorted: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    java.util.Arrays.sort(arr, new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    arr
  }
}

/**
 * `topk_by_score(id, score, k)` — distributed top-k-rows-per-group as a
 * proper aggregate: each partition keeps a k-bounded heap (map-side partial
 * aggregation), heaps merge after shuffle, final emits
 * `array<struct<id bigint, score double>>` best-first.
 *
 * This is the scale path that replaces `Window.partitionBy(g).orderBy(score)
 * + row_number() <= k`: the window form shuffles and sorts EVERY candidate
 * row per group; this ships at most k rows per partition per group. At
 * 100 TB (billions of candidates, thousands of groups) that is the
 * difference between a full-data shuffle and a ~k·partitions one.
 */
case class TopKAgg(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k >= 1, s"topk_by_score: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(
      idExpr.dataType == LongType && scoreExpr.dataType == DoubleType,
      s"topk_by_score requires (BIGINT id, DOUBLE score), got (${idExpr.dataType.sql}, ${scoreExpr.dataType.sql})")

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      buffer.insert(score.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKState): Any = {
    val arr = buffer.sorted
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) {
      out(i) = new GenericInternalRow(Array[Any](arr(i)._2, arr(i)._1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.heap.size * 16)
    bb.putLong(buffer.heap.size.toLong)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      bb.putDouble(s)
      bb.putLong(i)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val st = new TopKState(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val id = bb.getLong
      st.insert(s, id)
      i += 1
    }
    st
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
  override def prettyName: String = "topk_by_score"
}
