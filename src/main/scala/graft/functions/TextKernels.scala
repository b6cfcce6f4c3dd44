package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for whitespace tokenization: maximal runs of non-space
  * bytes, in order — exactly `filter(split(text, " "), t => length(t) > 0)`
  * (split on every single space, drop the empty strings that consecutive
  * / leading / trailing separators produce), but in ONE pass over the
  * UTF-8 bytes instead of a regex split plus an INTERPRETED filter HOF
  * (higher-order lambdas cost ~1 µs per element — the measured trap
  * documented on Dedup/Similarity). Byte-level scanning is exact: 0x20
  * never occurs inside a multi-byte UTF-8 sequence. */
object SpaceTokensImpl {
  def compute(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val len = b.length
    val out = new java.util.ArrayList[AnyRef](8)
    var i = 0
    while (i < len) {
      while (i < len && b(i) == ' ') i += 1
      val start = i
      while (i < len && b(i) != ' ') i += 1
      if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }
}

/** Custom Catalyst expression: whitespace tokens of a string column as a
  * single codegen'd scalar call. Tokenization is the first step of the
  * whole text/dedup family (shingles, MinHash, tf-idf, heavy hitters…),
  * so the per-element interpreted-HOF cost of the `filter(split(...))`
  * formulation was paid by every one of them. */
case class SpaceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"space_tokens requires string input, got ${other.simpleString(10)}")
  }

  // containsNull = false: the kernel never emits a null element (the HOF
  // formulation couldn't either — split emits strings, filter keeps a
  // subset).
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "space_tokens"

  override protected def nullSafeEval(input: Any): Any =
    SpaceTokensImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SpaceTokensImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SpaceTokens =
    copy(child = newChild)
}

/** Native kernel for word n-gram shingles over a token array: shingle i =
  * tokens[i..i+n-1] joined by one space; `distinct` keeps the FIRST
  * occurrence of each value (array_distinct order). Exactly equal to the
  * HOF formulation `transform(sequence(1, m-n+1), i => concat_ws(" ",
  * element_at(tk, i)..element_at(tk, i+n-1)))`:
  *  - UTF8String.concatWs skips null inputs, like concat_ws;
  *  - UTF8String equality is binary, like array_distinct's;
  *  - fewer than n tokens → empty array (callers guard null input).
  * One scalar call per row replaces m-n+1 interpreted lambda frames with
  * n element_at walks each. */
object WordShinglesImpl {
  private val Sep = UTF8String.fromString(" ")

  def compute(tk: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = tk.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    if (!distinct) {
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        var j = 0
        while (j < n) { parts(j) = tk.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](cnt * 2)
      var i = 0
      while (i < cnt) {
        var j = 0
        while (j < n) { parts(j) = tk.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
    }
  }
}

/** Native kernel: per-document bigram repetition statistics —
  * (total bigram occurrences, max multiplicity of any one bigram) in
  * ONE pass over the token array. Exactly the explode → count per
  * (doc, bigram) → per-doc sum/max pipeline it replaces: occurrences =
  * m−1 for m ≥ 2 tokens (0 otherwise), bigram identity = the two
  * tokens joined by one space (binary equality, concat_ws null-skip),
  * integer counts. The pipeline form shuffled every bigram OCCURRENCE
  * — corpus×(tokens−1) rows — twice; this computes the same two
  * integers inside the scan. */
object BigramRepImpl {
  private val Sep = UTF8String.fromString(" ")

  def compute(tk: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val m = tk.numElements()
    if (m < 2)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Int](m * 2)
    var maxRep = 0
    var i = 0
    while (i < m - 1) {
      val bg = UTF8String.concatWs(Sep, tk.getUTF8String(i), tk.getUTF8String(i + 1))
      val c = counts.merge(bg, 1, (a, b) => a + b)
      if (c > maxRep) maxRep = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((m - 1).toLong, maxRep.toLong))
  }
}

/** Custom Catalyst expression for [[BigramRepImpl]] — the repetition
  * quality signal at scan speed, no bigram-occurrence shuffle. */
case class BigramRepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_rep_stats requires array<string> input, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_bigrams",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("max_rep",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "bigram_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    BigramRepImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramRepImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramRepStats =
    copy(child = newChild)
}

/** Native kernel: Σ length(token) over a token array (character count,
  * like `length()`) — exactly `aggregate(tk, 0L, (acc, w) => acc +
  * length(w))`: a null element nulls the whole fold (length(null) is
  * null and + propagates), matching the HOF. */
object TokenLenSumImpl {
  def compute(tk: ArrayData): java.lang.Long = {
    val n = tk.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = tk.getUTF8String(i)
      if (t == null) return null
      acc += t.numChars()
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Custom Catalyst expression for [[TokenLenSumImpl]] — the
  * mean-token-length quality signal without one interpreted lambda
  * frame per token. */
case class TokenLenSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_len_sum requires array<string> input, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "token_len_sum"

  override protected def nullSafeEval(input: Any): Any =
    TokenLenSumImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |java.lang.Long ${ev.value}Tmp = graft.functions.TokenLenSumImpl.compute($c);
      |if (${ev.value}Tmp == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}Tmp.longValue();
      |}
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): TokenLenSum =
    copy(child = newChild)
}

/** Native kernel: count of tokens contained in a (small, constant) word
  * set — exactly `size(filter(tk, w => array_contains(words, w)))`:
  * null tokens drop out (array_contains(words, null) is null, filter
  * keeps only true), equality is binary. Linear scan per token — the
  * word list is a handful of stopwords. */
object WordHitsImpl {
  def compute(tk: ArrayData, words: ArrayData): Int = {
    val n = tk.numElements()
    val m = words.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      val t = tk.getUTF8String(i)
      if (t != null) {
        var j = 0
        var found = false
        while (j < m && !found) {
          val w = words.getUTF8String(j)
          found = w != null && w.equals(t)
          j += 1
        }
        if (found) hits += 1
      }
      i += 1
    }
    hits
  }
}

/** Custom Catalyst expression for [[WordHitsImpl]] — the stopword-ratio
  * language-ID signal without one interpreted lambda frame per token. */
case class WordHits(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"word_hits requires two array<string> inputs, got " +
          s"${l.simpleString(10)} / ${r.simpleString(10)}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "word_hits"

  override protected def nullSafeEval(tk: Any, words: Any): Any =
    WordHitsImpl.compute(tk.asInstanceOf[ArrayData], words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.WordHitsImpl.compute($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordHits =
    copy(left = newLeft, right = newRight)
}

/** Native kernel for ordered-pair expansion of a SORTED id array:
  * element i pairs with every later element, in (i asc, j asc) order —
  * exactly `flatten(transform(ids, (a, i) => transform(slice(ids, i+2,
  * size(ids)), b => struct(a AS doc_a, b AS doc_b))))`, the reducer-side
  * pair generation of the LSH bucket and n-gram index paths, without
  * the nested interpreted lambda frames (one per pair). */
object SortedPairsImpl {
  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    // n is capped by the callers' bucket guards (maxBucket/maxDf ≤ 10³);
    // past 65536 the pair count would overflow the array index.
    require(n <= 65536, s"sorted_pairs bucket too large: $n")
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a, ids.getLong(j)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Custom Catalyst expression for [[SortedPairsImpl]]. */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs requires array<bigint> input, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_a",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("doc_b",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "sorted_pairs"

  override protected def nullSafeEval(input: Any): Any =
    SortedPairsImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SortedPairsImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

/** Native kernel for the class-representative pair expansion
  * ([[graft.dedup.Dedup.lshReprPairs]]): element i of the sorted
  * (doc_id, m) struct array pairs with itself and every later element —
  * exactly `flatten(transform(ids, (a, i) => transform(slice(ids, i+1,
  * size(ids)-i), b => struct(a.doc_id, b.doc_id, a.m, b.m))))` without
  * one interpreted lambda frame per pair. */
object ReprPairsImpl {
  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    require(n <= 65536, s"repr_pairs bucket too large: $n")
    val da = new Array[Long](n)
    val ms = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = ids.getStruct(i, 2)
      da(i) = row.getLong(0); ms(i) = row.getLong(1)
      i += 1
    }
    val out = new Array[Any](n * (n + 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](da(i), da(j), ms(i), ms(j)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Custom Catalyst expression for [[ReprPairsImpl]]. */
case class ReprPairs(child: Expression) extends UnaryExpression {
  private val L = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _)
        if s.length == 2 && s(0).dataType == L && s(1).dataType == L =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repr_pairs requires array<struct<bigint, bigint>> input, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("repr_a", L, nullable = false),
      org.apache.spark.sql.types.StructField("repr_b", L, nullable = false),
      org.apache.spark.sql.types.StructField("n_a", L, nullable = false),
      org.apache.spark.sql.types.StructField("n_b", L, nullable = false))),
    containsNull = false)
  override def prettyName: String = "repr_pairs"

  override protected def nullSafeEval(input: Any): Any =
    ReprPairsImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ReprPairsImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ReprPairs =
    copy(child = newChild)
}

/** Custom Catalyst expression: word n-gram shingles of a token array as
  * one codegen'd scalar call — the inner loop of Dedup.shinglesOf (the
  * feed of MinHash banding, n-gram Jaccard, novelty, dup-span,
  * source-overlap…). The surrounding `when(size(tk) >= n, …)` guard in
  * shinglesOf is kept in Column space so null/short-input semantics stay
  * byte-identical to the HOF formulation it replaces. */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string> input, got ${other.simpleString(10)}")
  }

  // concat_ws never returns null, so elements are non-null — matching
  // transform(...)'s ArrayType(StringType, function.nullable = false).
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShinglesImpl.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
