package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the r20 CentroidArgmax kernel to the expression pipeline it
  * replaced: the explode → per-dim join → (vec, label, c_label) score
  * shuffle → RationalArgmax chain, rebuilt here verbatim, must agree
  * per vector with the kernel on (a) the gate corpus and (b) an
  * adversarial synthetic set exercising the half-up rounding boundary,
  * negatives, a zero vector, and rational-argmax ties. */
class CentroidKernelSpec extends SparkSuite {
  import spark.implicits._

  /** The pre-r20 formulation, verbatim (private pieces re-derived via
    * the public quantizeInt8 contract: label rides along by joining the
    * exploded rows back — same quantizer, same argmax). */
  private def oldConfusionPred(embeddings: DataFrame): DataFrame = {
    val exploded = Similarity.quantizeInt8(embeddings)
      .join(embeddings.select(col("vec_id"), col("label")), "vec_id")
    val centroids = Similarity.labelCentroidsQ(embeddings)
    val cents = centroids
      .select(col("label").as("c_label"), col("i"), col("sum_q"))
    val nTab = centroids.groupBy(col("label").as("c_label"))
      .agg(max(col("n_vecs")).as("n_c"))
    val argmax = udaf(Similarity.RationalArgmax)
    exploded
      .join(broadcast(cents), "i")
      .groupBy(col("vec_id"), col("label"), col("c_label"))
      .agg(sum(col("qv") * col("sum_q")).as("score"))
      .join(broadcast(nTab), "c_label")
      .groupBy(col("vec_id"), col("label"))
      .agg(argmax(col("c_label").cast("int"), col("score"), col("n_c"))
        .as("pred_label"))
  }

  private def kernelPred(embeddings: DataFrame): DataFrame = {
    val centroids = Similarity.labelCentroidsQ(embeddings)
    val mat = centroids.groupBy(col("label").as("c_label"))
      .agg(max(col("n_vecs")).as("n_c"),
        transform(sort_array(collect_list(struct(col("i"), col("sum_q")))),
          s => s("sum_q")).as("sums"))
      .select(struct(col("c_label"), col("n_c"), col("sums")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cents"))
    embeddings.crossJoin(broadcast(mat))
      .select(col("vec_id"), col("label"),
        graft.functions.GraftFunctions
          .centroidArgmax(col("embedding"), col("cents")).as("pred_label"))
  }

  private def assertAgree(embeddings: DataFrame): Unit = {
    val old = oldConfusionPred(embeddings)
      .select("vec_id", "pred_label").as[(Long, Int)].collect().toMap
    val neu = kernelPred(embeddings)
      .select("vec_id", "pred_label").as[(Long, Int)].collect().toMap
    assert(neu.keySet === old.keySet)
    val diff = old.collect { case (id, p) if neu(id) != p => (id, p, neu(id)) }
    assert(diff.isEmpty, s"kernel disagrees with expression pipeline: ${diff.take(5)}")
  }

  test("centroid_argmax == expression pipeline on the gate corpus") {
    assertAgree(graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001"))
  }

  test("centroid_argmax == expression pipeline on adversarial values " +
    "(half-up boundaries, negatives, zero vector, tie labels)") {
    // values engineered so x*127/amax lands on .5 boundaries (half-up
    // rounding must match Spark's Round-on-double), plus a zero vector
    // (amax = 0 → all-zero quantization) and duplicate vectors across
    // labels (equal rational scores → tie to the smaller label).
    val dims = 8
    def v(xs: Double*): Array[Float] = {
      require(xs.length == dims); xs.map(_.toFloat).toArray
    }
    val rows = Seq(
      (0L, v(254.0, 1.0, -1.0, 3.0, -3.0, 127.0, -127.0, 5.0), 0),
      (1L, v(254.0, 1.0, -1.0, 3.0, -3.0, 127.0, -127.0, 5.0), 1), // dup across labels
      (2L, v(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), 0),          // zero vector
      (3L, v(-254.0, 0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 253.0), 1),
      (4L, v(1e-3, 2e-3, -1e-3, 5e-4, -5e-4, 1.5e-3, -2e-3, 2e-3), 2),
      (5L, v(100.0, -100.0, 50.5, -50.5, 25.25, -25.25, 12.125, -12.125), 2),
      (6L, v(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0), 0),
      (7L, v(-1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0), 1))
    assertAgree(rows.toDF("vec_id", "embedding", "label"))
  }

  test("sparkRound0 matches Catalyst round(double) on boundary values") {
    val xs = Seq(0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999999999999994,
      126.5, -126.5, 1.0e-300, -1.0e-300, 63.49999999999999, 63.5)
    val fromCatalyst = xs.toDF("x")
      .select(round(col("x")).as("r")).as[Double].collect()
    xs.zip(fromCatalyst).foreach { case (x, expect) =>
      assert(graft.functions.CentroidArgmaxImpl.sparkRound0(x) === expect,
        s"round($x)")
    }
  }
}
