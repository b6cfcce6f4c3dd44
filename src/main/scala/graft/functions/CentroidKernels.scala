package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for nearest-centroid classification of ONE vector
  * against a broadcast centroid matrix — the per-row form of the
  * centroid-confusion pipeline (r20).
  *
  * The expression formulation exploded every vector to (i, qv) scalar
  * rows, joined the |labels|·dims centroid table by dimension (fan-out
  * |labels| per scalar row → vecs·dims·labels rows), shuffled that to
  * per-(vec, label) scores, and ran a typed rational-argmax aggregator —
  * one full shuffle whose volume is dims·labels× the corpus row count.
  * This kernel computes the identical answer inside the scan: quantize,
  * dot-product against each label's centroid sums, exact rational
  * argmax. The only remaining shuffle in the consumer is the
  * |labels|²-row crosstab.
  *
  * Exactness contract (spec-pinned against the expression formulation in
  * CentroidKernelSpec):
  *  - quantization replicates Catalyst bit for bit: cast float→double
  *    is exact widening; amax = array_max(|x|) in index order; qv =
  *    round(x·127/amax) with Spark's Round-on-double semantics —
  *    BigDecimal.valueOf (i.e. Double.toString-based, the Scala
  *    BigDecimal(double) constructor Spark uses) setScale(0, HALF_UP) —
  *    then cast to int (exact: values lie in [-127, 127]);
  *  - score per label = Σᵢ qvᵢ·sum_qᵢ in Long, index order (exact
  *    integer arithmetic — order irrelevant, no overflow: |qv| ≤ 127,
  *    |sum_q| ≤ 127·n);
  *  - argmax over score/n compares cross-multiplied in BigInteger
  *    (score_a·n_b vs score_b·n_a) exactly like RationalArgmax, ties to
  *    the smaller label; labels arrive sorted ascending so "strictly
  *    greater replaces" IS the tie rule.
  */
object CentroidArgmaxImpl {

  /** Spark Round(double, 0) semantics: scala BigDecimal(d).setScale(0,
    * HALF_UP), where scala BigDecimal(double) routes through
    * java BigDecimal.valueOf (canonical Double.toString). */
  def sparkRound0(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(0, RoundingMode.HALF_UP).doubleValue()

  /** `cents`: array of struct(c_label int, n_c long, sums array<long>),
    * sorted ascending by c_label, sums ordered by dimension. Returns the
    * predicted label. */
  def compute(vec: ArrayData, cents: ArrayData, floatInput: Boolean): Int = {
    val dims = vec.numElements()
    // quantize exactly like explodedInt8
    val v = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      v(i) = if (floatInput) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var amax = Double.NegativeInfinity
    i = 0
    while (i < dims) { val a = math.abs(v(i)); if (a > amax) amax = a; i += 1 }
    val qv = new Array[Long](dims)
    i = 0
    while (i < dims) {
      qv(i) = if (amax > 0) sparkRound0(v(i) * 127.0 / amax).toLong else 0L
      i += 1
    }
    // rational argmax over the label matrix (ascending label order)
    var bestLabel = 0
    var bestScore = 0L
    var bestN = 0L // 0 = empty sentinel, as in RationalArgmax.zero
    val m = cents.numElements()
    var c = 0
    while (c < m) {
      val row = cents.getStruct(c, 3)
      val label = row.getInt(0)
      val n = row.getLong(1)
      val sums = row.getArray(2)
      var score = 0L
      var j = 0
      while (j < dims) { score += qv(j) * sums.getLong(j); j += 1 }
      val better =
        if (bestN == 0L) n != 0L
        else if (n == 0L) false
        else {
          val cmp = java.math.BigInteger.valueOf(score)
            .multiply(java.math.BigInteger.valueOf(bestN))
            .compareTo(java.math.BigInteger.valueOf(bestScore)
              .multiply(java.math.BigInteger.valueOf(n)))
          cmp > 0 || (cmp == 0 && label < bestLabel)
        }
      if (better) { bestLabel = label; bestScore = score; bestN = n }
      c += 1
    }
    bestLabel
  }
}

/** Native kernel: float→double widening of an array — exactly
  * `transform(v, x => cast(x as double))` (exact widening, null
  * elements preserved) without one interpreted lambda frame per
  * element. Double input passes through unchanged. */
object ToDoubleArrayImpl {
  def compute(vec: ArrayData, floatInput: Boolean): ArrayData = {
    if (!floatInput) return vec
    val n = vec.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) out(i) = java.lang.Double.valueOf(vec.getFloat(i).toDouble)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Custom Catalyst expression for [[ToDoubleArrayImpl]] — the embedding
  * widening projection at the base of every ANN query. */
case class ToDoubleArray(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_double_array requires array<float|double> input, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(DoubleType, containsNull)
    case other => other
  }
  override def prettyName: String = "to_double_array"

  override protected def nullSafeEval(input: Any): Any =
    ToDoubleArrayImpl.compute(input.asInstanceOf[ArrayData], isFloatArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ToDoubleArrayImpl.compute($c, $isFloatArray)")

  override protected def withNewChildInternal(newChild: Expression): ToDoubleArray =
    copy(child = newChild)
}

/** Native kernel: max(abs(x)) over a float/double array, widened to
  * double — exactly `array_max(transform(v, x => abs(cast(x as
  * double))))` (index-order max is order-independent; abs after the
  * exact float→double widening), without two interpreted HOF passes.
  * Empty array → null, like array_max. */
object AbsMaxImpl {
  def compute(vec: ArrayData, floatInput: Boolean): java.lang.Double = {
    val n = vec.numElements()
    if (n == 0) return null
    var amax = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = if (floatInput) vec.getFloat(i).toDouble else vec.getDouble(i)
      val a = math.abs(x)
      if (a > amax) amax = a
      i += 1
    }
    java.lang.Double.valueOf(amax)
  }
}

/** Custom Catalyst expression for [[AbsMaxImpl]] — the quantizer's
  * scale factor at scan speed. */
case class AbsMax(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def isFloatArray: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"abs_max requires array<float|double> input, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "abs_max"

  override protected def nullSafeEval(input: Any): Any =
    AbsMaxImpl.compute(input.asInstanceOf[ArrayData], isFloatArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Double ${ev.value}Tmp = graft.functions.AbsMaxImpl.compute($c, $isFloatArray);
      |if (${ev.value}Tmp == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}Tmp.doubleValue();
      |}
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AbsMax =
    copy(child = newChild)
}

/** Custom Catalyst expression: nearest-centroid label of a raw embedding
  * against a (tiny, broadcast) centroid-accumulator matrix, computed at
  * scan speed — replaces the dims-explode → per-dim join → vecs·dims·
  * labels shuffle → typed argmax pipeline with zero pre-crosstab
  * shuffle. */
case class CentroidArgmax(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(StructType(Array(a, b, c)), _))
          if a.dataType == IntegerType && b.dataType == LongType &&
            c.dataType.isInstanceOf[ArrayType] =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "centroid_argmax requires (array<float|double>, array<struct<label int, " +
          s"n long, sums array<long>>>), got ${l.simpleString(10)} / ${r.simpleString(10)}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_argmax"

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    CentroidArgmaxImpl.compute(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], isFloatArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.CentroidArgmaxImpl.compute($v, $c, $isFloatArray);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidArgmax =
    copy(left = newLeft, right = newRight)
}
