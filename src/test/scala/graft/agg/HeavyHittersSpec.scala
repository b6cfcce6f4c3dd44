package graft.agg

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Misra-Gries + recount operator: the sketch only proposes
  * candidates; the output must EQUAL the full-groupBy answer on any
  * input, including adversarially skewed ones where the sketch's
  * decrement step actually prunes. */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  /** Zipf-ish skew over a vocabulary far larger than the sketch: most
    * mass on a few head items, a long uniform tail. */
  private def skewed(rnd: Random, n: Int, vocab: Int): Seq[String] =
    Seq.fill(n) {
      if (rnd.nextDouble() < 0.5) s"head_${rnd.nextInt(5)}"
      else s"tail_${rnd.nextInt(vocab)}"
    }

  private def exact(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("heavyHitters == exact full-groupBy answer on skewed data (10 seeds)") {
    (1 to 10).foreach { seed =>
      val rnd = new Random(seed)
      val items = skewed(rnd, n = 2000 + rnd.nextInt(3000), vocab = 500)
      val k = 10 + rnd.nextInt(40)
      val got = HeavyHitters
        .heavyHitters(items.toDF("item").repartition(8), "item", k)
        .select("item", "cnt").as[(String, Long)].collect().toMap
      assert(got === exact(items, k), s"seed=$seed k=$k")
    }
  }

  test("per-partition MG candidates are a superset of items above n_p/k") {
    (1 to 10).foreach { seed =>
      val rnd = new Random(100 + seed)
      val items = skewed(rnd, n = 5000, vocab = 1000)
      val k = 20
      val cands = HeavyHitters.misraGries(items.iterator, k).toSet
      val mustKeep = exact(items, k).keySet
      assert(mustKeep.subsetOf(cands),
        s"seed=$seed missing=${mustKeep -- cands}")
      // and the sketch is actually bounded
      assert(cands.size < k, s"seed=$seed sketch overflowed: ${cands.size}")
    }
  }

  test("null items are excluded; k larger than vocab returns everything over N/k") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b")).toDF("item")
    val got = HeavyHitters.heavyHitters(df, "item", 4)
      .select("item", "cnt", "n_total").as[(String, Long, Long)].collect()
    // N=4 non-null; threshold cnt*4 > 4 → cnt >= 2 → only "a"(3)
    assert(got.toSeq === Seq(("a", 3L, 4L)))
  }

  test("cross-run candidate union == single-pass answer, incl. a run-skewed hitter") {
    // the adversarial shapes for a WRONG merge design: 'lop' has ALL
    // its mass in run 1 (absent from run 2's sketch — an INTERSECTING
    // merge loses it; the union must not), and the tails are noise the
    // per-run sketches may propose but the combined exact recount must
    // reject (a design that unions per-run ANSWERS instead of
    // recounting keeps false positives).
    val rnd = new Random(20260813)
    val run1 = Seq.fill(60)("lop") ++ Seq.fill(50)("both") ++
      Seq.fill(90)(s"t1_${rnd.nextInt(50)}")
    val run2 = Seq.fill(50)("both") ++ Seq.fill(150)(s"t2_${rnd.nextInt(50)}")
    val all = run1 ++ run2
    val k = 8
    val merged = HeavyHitters
      .candidateSketch(run1.toDF("item"), "item", k)
      .unionByName(HeavyHitters.candidateSketch(run2.toDF("item"), "item", k))
      .distinct()
    val got = HeavyHitters
      .heavyHittersFrom(all.toDF("item"), "item", k, merged)
      .select("item", "cnt").as[(String, Long)].collect().toMap
    assert(got === exact(all, k), "merged path diverged from exact")
    assert(got.contains("lop"), "the run-skewed hitter was lost")
    val single = HeavyHitters.heavyHitters(all.toDF("item"), "item", k)
      .select("item", "cnt").as[(String, Long)].collect().toMap
    assert(got === single, "merge path != single-pass path")
  }
}
