package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Production-vocabulary BPE merge table: rules precompiled into a
 * rank-indexed pair lookup, shipped to executors as ONE reference object
 * instead of being baked into the plan as literal `replace` chains.
 *
 * [[graft.pipeline.Bpe.tokenCount]]'s literal-replace walk is the right
 * spelling for a demo-sized vocabulary (every step a codegen'd built-in,
 * oracle-replayable in any SQL engine), but it embeds one expression node
 * per rule — a real 50k-merge vocabulary means a 50k-deep expression tree
 * that analysis and codegen cannot digest. This table keeps the plan a
 * single expression node at ANY vocabulary size; the walk runs in executor
 * memory over a linked token list.
 *
 * Rules must be distinct (a duplicate rule would re-fire on occurrences
 * created after its first pass, which the single-pass walk would not), and
 * rule symbols must not contain spaces or the word-boundary marker — the
 * same contract the literal walk enforces.
 */
final class BpeMergeTable(val merges: Seq[(String, String)]) extends Serializable {
  require(merges.distinct == merges,
    s"duplicate merge rules (${merges.size - merges.distinct.size} repeats); " +
      "a BPE vocabulary lists each rule once")
  require(merges.forall { case (a, b) =>
    val s = a + b
    a.nonEmpty && b.nonEmpty && !s.contains(' ') && !s.contains('\u001f')
  }, "merge symbols must be non-empty and contain no spaces or \\u001f")

  private[expressions] val pairsA: Array[String] = merges.map(_._1).toArray
  private[expressions] val pairsB: Array[String] = merges.map(_._2).toArray
  private[expressions] val mergedSym: Array[String] =
    merges.map { case (a, b) => a + b }.toArray

  /** rank lookup without per-call key allocation: symbol a -> (symbol b ->
    * rank). Rebuilt lazily on each executor after deserialization. */
  @transient private lazy val ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var i = 0
    while (i < pairsA.length) {
      m.computeIfAbsent(pairsA(i), _ => new java.util.HashMap[String, Integer]())
        .put(pairsB(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Rank of pair (a, b), or -1 when no rule merges it. */
  def rankOf(a: String, b: String): Int = {
    val inner = ranks.get(a)
    if (inner == null) -1
    else {
      val r = inner.get(b)
      if (r == null) -1 else r.intValue()
    }
  }

  override def equals(other: Any): Boolean = other match {
    case t: BpeMergeTable => t.merges == merges
    case _ => false
  }
  override def hashCode(): Int = merges.hashCode()
}

/**
 * BPE token count under a [[BpeMergeTable]] — the production-vocabulary
 * twin of [[graft.pipeline.Bpe.tokenCount]], computing the IDENTICAL
 * function (CurationSpec asserts parity rule-for-rule, including the
 * single-pass non-overlap fine print) with the merge table held in
 * executor memory instead of the plan.
 *
 * Scale shape: one expression node regardless of vocabulary size; per row
 * the walk visits each code point once, then touches only positions where
 * a rule actually fires (a rank-ordered worklist over live pair
 * occurrences — O(doc length + merge events), never O(rules × length)
 * like the literal chain). Codegen'd as a single static call with the
 * table bound via `addReferenceObj`, so it sits inside whole-stage
 * codegen like any built-in.
 */
case class BpeTokenCount(child: Expression, table: BpeMergeTable)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"bpe token count requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    BpeTokenCount.count(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BpeTokenCount.count($a, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
  override def prettyName: String = "bpe_token_count_vocab"
}

/**
 * Production-vocabulary BPE ENCODE — the pieces themselves (markers
 * dropped, document order), same [[BpeMergeTable]] single-node plan
 * shape and worklist walk as [[BpeTokenCount]]; `size(...)` of this
 * expression equals the count expression by shared arithmetic. One
 * vocabulary join from token ids at any vocabulary size.
 */
case class BpeEncodeVocab(child: Expression, table: BpeMergeTable)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"bpe encode requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    BpeTokenCount.encode(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.BpeTokenCount.encode($a, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncodeVocab =
    copy(child = c)
  override def prettyName: String = "bpe_encode_vocab"
}

object BpeTokenCount {

  private final val Marker = "\u001f"

  /**
   * The merge walk, replicating the literal-replace pipeline exactly:
   *
   *  1. trim ASCII spaces (what Spark's `trim` removes); empty -> 0;
   *  2. collapse each whitespace run to one marker token (the
   *     `regexp_replace(_, "\\s+", marker)` step);
   *  3. one token per CODE POINT (the `"(.)" -> "$1 "` spacing — Java
   *     regex `.` matches a code point, so surrogate pairs stay whole);
   *  4. for each rule in vocabulary order, merge its current adjacent
   *     occurrences left-to-right, where a merge consumes the delimiter
   *     after its right symbol — so an occurrence starting IMMEDIATELY
   *     after a merged pair is skipped in that rule's pass (the literal
   *     `" a b " -> " ab "` non-overlap fine print);
   *  5. count = live tokens - markers (the `pieces - (nWords - 1)`
   *     arithmetic, with nWords counting trailing empty splits the way
   *     Spark's `split(_, _, -1)` does).
   *
   * Rule passes run through a rank-ordered worklist of pair occurrences:
   * rules absent from the document cost nothing, and a merge enqueues the
   * adjacencies it creates only for LATER rules (an earlier rule's pass is
   * over — exactly the literal chain's behavior).
   */
  def count(text: UTF8String, table: BpeMergeTable): Int = {
    val w = mergeWalk(text, table)
    if (w == null) 0 else w.live - (w.nWords - 1)
  }

  /** The encoded pieces in document order, markers dropped — the encode
    * companion ([[graft.pipeline.Bpe.encodeVocab]]); size equals
    * [[count]] by the same arithmetic (live tokens minus the nWords-1
    * markers). */
  def encode(text: UTF8String,
      table: BpeMergeTable): org.apache.spark.sql.catalyst.util.ArrayData = {
    val w = mergeWalk(text, table)
    if (w == null) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    }
    val out = new Array[Any](w.live - (w.nWords - 1))
    var p = 0
    var o = 0
    while (p >= 0) {
      val t = w.toks(p)
      if (t != Marker) { out(o) = UTF8String.fromString(t); o += 1 }
      p = w.next(p)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Walk result: the merged token array (consumed slots null), the
    * live-list next pointers (node 0 is always live), live token count,
    * and the split word count the marker arithmetic needs. */
  private final class Walk(
      val toks: Array[String], val next: Array[Int],
      val live: Int, val nWords: Int)

  /** The shared merge walk behind [[count]] and [[encode]]; null for
    * empty/whitespace-only text. */
  private def mergeWalk(text: UTF8String, table: BpeMergeTable): Walk = {
    val raw = text.toString
    var from = 0
    var to = raw.length
    while (from < to && raw.charAt(from) == ' ') from += 1
    while (to > from && raw.charAt(to - 1) == ' ') to -= 1
    if (from >= to) return null
    val s = raw.substring(from, to)

    // tokens: one per code point of the marker-collapsed document
    val marked = s.replaceAll("\\s+", Marker)
    val n = marked.codePointCount(0, marked.length)
    val toks = new Array[String](n)
    var ci = 0
    var ti = 0
    while (ci < marked.length) {
      val cp = marked.codePointAt(ci)
      val w = Character.charCount(cp)
      toks(ti) = marked.substring(ci, ci + w)
      ci += w
      ti += 1
    }

    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    var i = 0
    while (i < n) { next(i) = i + 1; prev(i) = i - 1; i += 1 }
    next(n - 1) = -1

    // rank -> candidate left-positions with a live occurrence (validity
    // re-checked at pop; stale entries are just skipped)
    val pending = new java.util.TreeMap[Integer, scala.collection.mutable.ArrayBuffer[Int]]()
    def addCand(rank: Int, pos: Int): Unit =
      pending.computeIfAbsent(Integer.valueOf(rank),
        _ => scala.collection.mutable.ArrayBuffer[Int]()) += pos

    i = 0
    while (i < n - 1) {
      val r = table.rankOf(toks(i), toks(i + 1))
      if (r >= 0) addCand(r, i)
      i += 1
    }

    var live = n
    while (!pending.isEmpty) {
      val e = pending.pollFirstEntry()
      val rank = e.getKey.intValue()
      val a = table.pairsA(rank)
      val b = table.pairsB(rank)
      val cands = e.getValue.sorted
      var blockedNode = -1 // leading delimiter consumed by the last merge
      for (p <- cands) {
        if (p != blockedNode && toks(p) != null && toks(p) == a) {
          val q = next(p)
          if (q >= 0 && toks(q) == b) {
            toks(p) = table.mergedSym(rank)
            toks(q) = null
            next(p) = next(q)
            if (next(q) >= 0) prev(next(q)) = p
            live -= 1
            blockedNode = next(p)
            val pr = prev(p)
            if (pr >= 0) {
              val r2 = table.rankOf(toks(pr), toks(p))
              if (r2 > rank) addCand(r2, pr)
            }
            if (next(p) >= 0) {
              val r2 = table.rankOf(toks(p), toks(next(p)))
              if (r2 > rank) addCand(r2, p)
            }
          }
        }
      }
    }

    val nWords = s.split("\\s+", -1).length
    new Walk(toks, next, live, nWords)
  }
}
