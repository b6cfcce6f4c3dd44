package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the SimHash expression: per document, bit b of the
  * fingerprint is the majority vote of bit b of md5(token) across all
  * token occurrences, emitted as lowercase hex (bits/4 chars).
  *
  * Bit-for-bit identical to the pure-SQL formulation the DuckDB oracle
  * runs (hex nibble i of the digest = nibble value; bit j of nibble,
  * MSB first ⇒ bit (7 - b%8) of digest byte b/8).
  */
object SimHashImpl {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes

  def compute(tokens: ArrayData, bits: Int): UTF8String = {
    val votes = new Array[Int](bits)
    var n = 0
    var i = 0
    val m = tokens.numElements()
    while (i < m) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val d = md5.get(); d.reset()
        val h = d.digest(t.getBytes)
        n += 1
        var b = 0
        while (b < bits) {
          if (((h(b >> 3) >> (7 - (b & 7))) & 1) == 1) votes(b) += 1
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](bits / 4)
    var ni = 0
    while (ni < bits / 4) {
      var v = 0; var j = 0
      while (j < 4) {
        if (votes(ni * 4 + j) * 2 > n) v |= 1 << (3 - j)
        j += 1
      }
      out(ni) = Hex(v)
      ni += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Custom Catalyst expression (SURVEY.md §7.3 extension point (b)):
  * simhash of a token array. A scalar per-ROW function whose inner loop
  * is plain JVM code, so it JITs; `doGenCode` emits a single static call
  * that stays inside whole-stage codegen — no explode, no 64-column
  * vote aggregation, no shuffle. The Column-expression formulation of
  * the same algorithm cost 2.6 s at sf0.1; this runs at scan speed. */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits % 4 == 0 && bits > 0 && bits <= 128,
    s"bits must be a positive multiple of 4 <= 128, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashImpl.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Native kernel for MinHash signatures: k seeded min-md5s over a
  * shingle array, returned as lowercase hex strings. Identical to
  * `min(md5(concat(seed, ':', shingle)))` per seed: hex is order-
  * preserving, so the lexicographic min of hex strings equals the
  * unsigned byte-order min of digests. */
object MinHashImpl {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  // seed prefixes depend only on k — cached, not rebuilt per row
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def seedsFor(k: Int): Array[Array[Byte]] =
    seedCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(s => (s.toString + ":").getBytes("UTF-8")))

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val d = md5.get()
    val mins = new Array[Array[Byte]](k)
    val seeds = seedsFor(k)
    var i = 0
    val m = shingles.numElements()
    while (i < m) {
      val sh = shingles.getUTF8String(i)
      if (sh != null) {
        val shBytes = sh.getBytes
        var s = 0
        while (s < k) {
          d.reset()
          d.update(seeds(s))
          d.update(shBytes)
          val h = d.digest()
          if (mins(s) == null || unsignedLess(h, mins(s))) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[UTF8String](k)
    var s = 0
    while (s < k) {
      val h = mins(s)
      if (h == null) out(s) = null
      else {
        val hex = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          hex(2 * j) = Hex((h(j) >> 4) & 0xf)
          hex(2 * j + 1) = Hex(h(j) & 0xf)
          j += 1
        }
        out(s) = UTF8String.fromBytes(hex)
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}

/** Custom Catalyst expression: k seeded min-hashes of a shingle array in
  * one native pass — replaces explode + groupBy(doc_id) + k min(md5(...))
  * aggregates (a full shuffle of every shingle row) with a zero-shuffle
  * scalar computed at scan speed. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 128, s"k must be in [1,128], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashImpl.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native cosine-similarity kernel: the EXACT interleaved sequential
  * folds the Catalyst HOF tree (`aggregate(zip_with(a,b,*),0,+)` over
  * dot and both norms) evaluates — each accumulator adds in index order,
  * so the result is bit-identical to both the HOF formulation and the
  * oracle's list_reduce, at JIT speed instead of ~1 µs/lambda
  * interpretation. Assumes equal-length inputs (the embedding schema). */
object CosineImpl {
  /** Returns null exactly where the HOF formulation returned NULL: when
    * the lengths differ (zip_with pads the shorter side with null) or
    * when any element is null (null propagates through every fold) —
    * never reads past either array. */
  def computeOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** Custom Catalyst expression: cosine similarity of two double arrays as
  * one codegen'd scalar call — the ANN scoring hot path (every candidate
  * pair evaluates it) stays inside whole-stage codegen instead of
  * interpreting three nested higher-order folds. */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.DoubleType, _),
            ArrayType(org.apache.spark.sql.types.DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<double> inputs, got " +
          s"${l.simpleString(10)} / ${r.simpleString(10)}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "cosine_sim"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineImpl.computeOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}Tmp = graft.functions.CosineImpl.computeOrNull($a, $b);
      |if (${ev.value}Tmp == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}Tmp.doubleValue();
      |}
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Session extensions (`spark.sql.extensions=graft.functions.GraftExtensions`,
  * set by GraftSession): registers the engine's custom expressions so they
  * are callable from SQL and via `call_function` — the public, documented
  * extension mechanism. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def binLit(e: Expression, what: String): Array[Byte] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Array[Byte], _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a binary literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash(args.head, 64)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args.head, intLit(args(1), "minhash_sig k"))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("space_tokens"),
      new ExpressionInfo(classOf[SpaceTokens].getName, "space_tokens"),
      (args: Seq[Expression]) => SpaceTokens(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args.head,
        intLit(args(1), "word_shingles n"),
        args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles distinct must be a boolean literal, got $other")
        })))
    ext.injectFunction((
      new FunctionIdentifier("bigram_rep_stats"),
      new ExpressionInfo(classOf[BigramRepStats].getName, "bigram_rep_stats"),
      (args: Seq[Expression]) => BigramRepStats(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("token_len_sum"),
      new ExpressionInfo(classOf[TokenLenSum].getName, "token_len_sum"),
      (args: Seq[Expression]) => TokenLenSum(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_hits"),
      new ExpressionInfo(classOf[WordHits].getName, "word_hits"),
      (args: Seq[Expression]) => WordHits(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("repr_pairs"),
      new ExpressionInfo(classOf[ReprPairs].getName, "repr_pairs"),
      (args: Seq[Expression]) => ReprPairs(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("sorted_pairs"),
      new ExpressionInfo(classOf[SortedPairs].getName, "sorted_pairs"),
      (args: Seq[Expression]) => SortedPairs(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("to_double_array"),
      new ExpressionInfo(classOf[ToDoubleArray].getName, "to_double_array"),
      (args: Seq[Expression]) => ToDoubleArray(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("abs_max"),
      new ExpressionInfo(classOf[AbsMax].getName, "abs_max"),
      (args: Seq[Expression]) => AbsMax(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("centroid_argmax"),
      new ExpressionInfo(classOf[CentroidArgmax].getName, "centroid_argmax"),
      (args: Seq[Expression]) => CentroidArgmax(args.head, args(1))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (args: Seq[Expression]) =>
        BloomMightContain(args.head, binLit(args(1), "bloom_might_contain bytes"))))
    // whole-operator extension (SURVEY §7.3 (c)): the native as-of join
    ext.injectPlannerStrategy(_ => graft.plans.AsofMergeStrategy)
    // optimizer-rule extension: bound unpartitioned row_number top-k
    // windows with a distributed Sort+Limit (TakeOrderedAndProject)
    ext.injectOptimizerRule(_ => graft.plans.BoundGlobalTopK)
  }
}

object GraftFunctions {
  /** 64-bit simhash over a token array column → 16-char hex string. */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  /** k seeded min-md5s over a shingle array column → array of hex strings. */
  def minhashSig(shingles: Column, k: Int): Column =
    call_function("minhash_sig", shingles, org.apache.spark.sql.functions.lit(k))

  /** Cosine similarity of two array<double> columns (codegen'd scalar). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Whitespace tokens of a text column (codegen'd one-pass scalar —
    * exactly `filter(split(text, " "), t => length(t) > 0)`). */
  def spaceTokens(text: Column): Column = call_function("space_tokens", text)

  /** Word n-gram shingles of a token array (codegen'd scalar — exactly
    * the transform/element_at/concat_ws HOF chain, `distinct` =
    * array_distinct's first-occurrence order). Callers guard n > size. */
  def wordShingles(tk: Column, n: Int, distinct: Boolean): Column =
    call_function("word_shingles", tk,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(distinct))

  /** Nearest-centroid label of a raw embedding against a broadcast
    * centroid matrix (codegen'd scalar — exactly the explode/join/
    * rational-argmax pipeline, see CentroidKernels). */
  def centroidArgmax(embedding: Column, cents: Column): Column =
    call_function("centroid_argmax", embedding, cents)

  /** max(abs(x)) of a float/double array widened to double (codegen'd
    * scalar == array_max(transform(v, abs)) over the cast array). */
  def absMax(v: Column): Column = call_function("abs_max", v)

  /** float→double array widening (codegen'd scalar == transform(v,
    * cast) — see CentroidKernels.ToDoubleArray). */
  def toDoubleArray(v: Column): Column = call_function("to_double_array", v)

  /** Ordered pairs (a < b) of a sorted id array (codegen'd scalar ==
    * the nested transform/slice HOF chain — see TextKernels). */
  def sortedPairs(ids: Column): Column = call_function("sorted_pairs", ids)

  /** Self-inclusive ordered pairs of a sorted (doc_id, m) struct array
    * (codegen'd scalar == the lshReprPairs HOF chain — see TextKernels). */
  def reprPairs(ids: Column): Column = call_function("repr_pairs", ids)

  /** Σ length(token) (codegen'd scalar == aggregate(tk, 0L, acc +
    * length(w)) — see TextKernels). */
  def tokenLenSum(tk: Column): Column = call_function("token_len_sum", tk)

  /** Per-doc (bigram occurrences, max bigram multiplicity) in one scan
    * pass (== the explode/count/sum-max pipeline — see TextKernels). */
  def bigramRepStats(tk: Column): Column = call_function("bigram_rep_stats", tk)

  /** Count of tokens in a small constant word set (codegen'd scalar ==
    * size(filter(tk, w => array_contains(words, w)))). */
  def wordHits(tk: Column, words: Column): Column =
    call_function("word_hits", tk, words)
}
