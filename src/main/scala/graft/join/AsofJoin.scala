package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — each left row picks up the LATEST right row whose
  * timestamp is <= the left row's (inclusive), per key: the
  * point-in-time lookup every event pipeline needs (latest price at
  * trade time, last profile before the click, temporal-table join).
  *
  * Spark has no asof operator, and the preference ladder says compose
  * before building custom plans — this IS expressible with existing
  * operators, exactly once you see it as a MERGE: union both sides,
  * sort each key's timeline with right rows ordered before left rows at
  * equal timestamps (inclusive semantics), and carry the last non-null
  * right payload forward with `last(..., ignoreNulls) over (rows
  * unbounded preceding)`. One hash-partition window per key — the same
  * shuffle an equi-join would pay, no range-join blowup, no custom
  * physical operator to maintain.
  *
  * Contract: `left`/`right` are pre-projected to (key, ts, payload...)
  * with disjoint payload names; the RIGHT side must be unique per
  * (key, ts) (dedup upstream — ties at one timestamp have no defined
  * winner in any engine's asof). Left rows with no earlier right row
  * keep NULL payloads (left-outer semantics). */
object AsofJoin {

  /** Opt-in CONTRACT CHECK (both asof forms): the right side must be
    * unique per (key, ts). Both formulations tolerate a violation
    * silently — the window form resolves ties deterministically by
    * xxhash64 and the native merge last-wins in sort order — so a caller
    * who wants violations to SURFACE passes `checkContract = true` and
    * pays one extra window pass over the right side (debug/CI shape, not
    * the hot path). Per-row `assert_true` raises with the offending
    * (key, ts) rendered into the message; the `isNull` filter keeps every
    * row (assert_true yields NULL) while forcing evaluation. */
  private def withUniquenessCheck(right: DataFrame, keyCol: String,
                                  tsCol: String, enabled: Boolean): DataFrame =
    if (!enabled) right
    else {
      val w = Window.partitionBy(col(keyCol), col(tsCol))
      right
        .withColumn("__dup", count(lit(1)).over(w))
        .withColumn("__chk", assert_true(col("__dup") === 1,
          concat(lit("asof contract violation: right side has duplicate (key, ts) rows at key="),
            col(keyCol).cast("string"), lit(", ts="), col(tsCol).cast("string"))))
        .filter(col("__chk").isNull)
        .drop("__dup", "__chk")
    }

  def asof(left: DataFrame, right: DataFrame,
           keyCol: String, tsCol: String,
           checkContract: Boolean = false): DataFrame = {
    val right0 = withUniquenessCheck(right, keyCol, tsCol, checkContract)
    asofImpl(left, right0, keyCol, tsCol)
  }

  private def asofImpl(left: DataFrame, right: DataFrame,
                       keyCol: String, tsCol: String): DataFrame = {
    val lNames = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    val rNames = right.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    require(lNames.intersect(rNames).isEmpty,
      s"payload columns must be disjoint: ${lNames.intersect(rNames)}")
    // The right payload travels as ONE struct, carried forward as a unit:
    // per-column carry-forward would stitch together values from
    // DIFFERENT right rows whenever a matched row holds a NULL field
    // (and make "matched, field was NULL" indistinguishable from "no
    // match"). The struct itself is never null for a real right row, so
    // last(ignoreNulls) picks exactly the latest whole row.
    val rpType = org.apache.spark.sql.types.StructType(
      rNames.map(c => right.schema(right.schema.fieldIndex(c))))
    val lAligned = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side")) ++
        lNames.map(col) :+
        lit(null).cast(rpType).as("__rp"): _*)
    val rAligned = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side")) ++
        lNames.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rNames.map(col): _*).as("__rp"): _*)
    // xxhash64(__rp) as the final sort key: the right side is CONTRACTED
    // to be unique per (key, ts), but if a caller violates that, the
    // winner among tied right rows would otherwise be partition-order
    // dependent — a silently flaky payload. The hash makes the violation
    // deterministic (max-hash row wins) instead of run-dependent; for
    // contract-abiding inputs it never breaks a tie (no ties exist).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), xxhash64(col("__rp")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++ lNames.map(col) ++
        rNames.map(c => col(s"__rp.$c").as(c)): _*)
  }

  /** The NATIVE formulation of the same join: a custom
    * LogicalPlan/SparkStrategy/SparkPlan (`graft.plans.AsofMergeJoin`,
    * registered by GraftExtensions) that co-partitions and sorts each
    * side separately and streams a per-partition merge — no union of the
    * two sides, no window buffer, O(1) merge state. Same contract as
    * [[asof]] plus: key and ts must be ORDERABLE types, matching across
    * sides, and non-null (the merge compares via interpreted orderings —
    * long, string, timestamp, decimal all work). Output column ORDER
    * differs from [[asof]] (left columns then right payload); the SET of
    * columns is identical. */
  def asofNative(left: DataFrame, right: DataFrame,
                 keyCol: String, tsCol: String,
                 checkContract: Boolean = false): DataFrame = {
    val right0 = withUniquenessCheck(right, keyCol, tsCol, checkContract)
    asofNativeImpl(left, right0, keyCol, tsCol)
  }

  private def asofNativeImpl(left: DataFrame, right: DataFrame,
                             keyCol: String, tsCol: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // Re-alias every right column: left and right usually derive from the
    // SAME scan, so their plans share exprIds — the analyzer's
    // DeduplicateRelations rewrites the duplicate child under a custom
    // node without rewriting the node's own attribute fields (it only
    // knows built-in shapes), leaving them dangling. Fresh aliases make
    // the right side's top-level attributes unique up front.
    val rPlan = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val (lk, lt) = (attr(lPlan, keyCol), attr(lPlan, tsCol))
    val (rk, rt) = (attr(rPlan, keyCol), attr(rPlan, tsCol))
    require(lk.dataType == rk.dataType && lt.dataType == rt.dataType,
      "asofNative key/ts types must match across sides")
    require(Seq(lk, lt).forall(a =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType)),
      s"asofNative requires orderable key/ts types, got ${lk.dataType}/${lt.dataType}")
    val rPayload = rPlan.output.filterNot(a => a.name == keyCol || a.name == tsCol)
    require(left.columns.toSet.intersect(rPayload.map(_.name).toSet).isEmpty,
      "payload columns must be disjoint")
    org.apache.spark.sql.GraftPlanBridge.ofRows(left.sparkSession,
      graft.plans.AsofMergeJoin(lPlan, rPlan, lk, lt, rk, rt, rPayload))
  }
}
