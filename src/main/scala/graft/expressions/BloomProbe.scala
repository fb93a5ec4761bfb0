package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Membership probe against a broadcast Bloom filter: `might contain` of
 * the child string's UTF-8 bytes. NULL probes to `false` (a NULL key is
 * in no reference set), so the result is never null and the expression
 * can sit in a scan-level filter without a null branch.
 *
 * Custom Expression (vs the boxed Scala UDF it replaces): the probe is a
 * bit-array lookup no built-in expresses, and as an Expression with
 * `doGenCode` it stays inside the scan's whole-stage-codegen'd filter —
 * no row boxing, no String materialization (the filter is probed with
 * the UTF8String's bytes, the exact bytes `putString` inserted on the
 * build side). The filter rides as a Broadcast reference bound via
 * `addReferenceObj`, ONE executor-memory copy per host regardless of
 * task count — the same plan-size discipline as [[BpeMergeTable]].
 */
case class BloomMightContain(child: Expression, filter: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"bloom probe requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && BloomMightContain.probe(v.asInstanceOf[UTF8String], filter.value)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bloomBc", filter, classOf[Broadcast[_]].getName)
    val bf = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $ref.value();")
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = !${childGen.isNull} &&
          graft.expressions.BloomMightContain.probe(${childGen.value}, $bf);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  /** Shared kernel: probe with the string's UTF-8 bytes — identical to
    * `mightContainString` minus the String round-trip. */
  def probe(s: UTF8String, bf: BloomFilter): Boolean =
    bf.mightContainBinary(s.getBytes)
}
