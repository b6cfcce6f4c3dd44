package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Custom Catalyst expression: membership probe of a serialized
  * `org.apache.spark.util.sketch.BloomFilter` against a LONG key column.
  *
  * This is the probe half of a manual runtime filter (the same mechanism
  * Spark's own injected bloom-filter join uses): the build side serializes
  * a bloom of its join keys, and the probe side evaluates `might_contain`
  * map-side — INSIDE whole-stage codegen, before any exchange — so rows
  * that cannot possibly join never enter the shuffle. False positives are
  * allowed (the exact join downstream removes them); false negatives are
  * impossible, so the final result is exact.
  *
  * The filter bytes travel as a plan-level constant and are deserialized
  * once per JVM via the transient lazy below (not once per row/batch).
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def test(v: Long): Boolean = filter.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFunctions {
  /** Build a bloom filter over `dim`'s `key` column (driver-side, like
    * any runtime-filter build: the build side is the SMALL side) and
    * return a probe Column usable as a map-side pre-filter. */
  def bloomOf(dim: org.apache.spark.sql.DataFrame, key: String,
              expectedKeys: Long, fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(key, expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    call_function("bloom_might_contain", key, lit(bloomBytes))
}
