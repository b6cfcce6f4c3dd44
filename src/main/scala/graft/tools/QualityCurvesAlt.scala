package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Args, GraftSession, Json, Tables}
import graft.sim.Similarity

/** Quality-curve robustness on content-different corpora (r16 verdict
  * item 6). The hash gates proved the EXACT results are not
  * fixture-tuned (alternate-seed oracle batch, 157/157); the quality
  * CONTRACTS — IVF recall-vs-nprobe and SemDeDup drop-rate-vs-threshold
  * — were still measured on one fixture each (IvfCurveSpec /
  * SemDedupCurveSpec seeds). This main recaptures both curves on:
  *
  *  1. the REAL embeddings table of a primary dir vs its GenAlt twin
  *     (seeded ±10% embedding jitter, content-different by
  *     construction) — per-grid-point |Δ mean_recall| must stay within
  *     `--band` (default 0.05);
  *  2. the committed synthetic fixture seed vs an alternate seed at the
  *     same (N, dim, clusters, noise) — same band;
  *  3. SemDeDup on both real corpora — the monotonicity CONTRACT
  *     (drop rate non-increasing in threshold at fixed nlist) must hold
  *     on the alt corpus; drop-rate deltas are reported, not banded
  *     (drop rate legitimately tracks content).
  *
  * Prints ONE JSON line (metric "quality_curves_alt"); exit 1 on any
  * band/contract violation.
  *
  * Usage: run_main.sh graft.tools.QualityCurvesAlt
  *          --primary /root/testdata/sf0.1 --alt .tmp/testdata_alt11
  *          [--band 0.05] [--queries 20] [--k 10]
  */
object QualityCurvesAlt {

  private def ivf(emb: DataFrame, nQueries: Int, k: Int,
                  nlists: Seq[Int], probes: Seq[Int]): Seq[(Int, Int, Double)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    Similarity.ivfCurve(emb, nQueries, k, nlists, probes)
      .select("nlist", "nprobe", "mean_recall")
      .as[(Int, Int, Double)].collect().toSeq.sortBy(t => (t._1, t._2))
  }

  private def sem(emb: DataFrame, nlists: Seq[Int],
                  thresholds: Seq[Double]): Seq[(Int, Double, Double)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    Similarity.semDedupCurve(emb, nlists, thresholds)
      .select("nlist", "threshold", "drop_rate")
      .as[(Int, Double, Double)].collect().toSeq.sortBy(t => (t._1, t._2))
  }

  private def fmtIvf(xs: Seq[(Int, Int, Double)]): String =
    xs.map { case (nl, np, r) => f"""[$nl,$np,$r%.4f]""" }
      .mkString("[", ",", "]")

  private def fmtSem(xs: Seq[(Int, Double, Double)]): String =
    xs.map { case (nl, t, r) => f"""[$nl,$t%.2f,$r%.4f]""" }
      .mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val a = Args(args)
    val spark: SparkSession = GraftSession.build("graft-quality-curves")
    val primary = a.getOrElse("primary", "/root/testdata/sf0.1")
    val alt = a.getOrElse("alt", "/root/repo/.tmp/testdata_alt11")
    val band = a.getOrElse("band", "0.05").toDouble
    // The synthetic leg's band is wider: its two corpora are DIFFERENT
    // content by construction (independent seeds), so extreme grid
    // points (nprobe=1 at the largest nlist) legitimately move more
    // than a ±10% jitter of the SAME vectors does — measured 0.075 at
    // 20 queries on the fixture pair.
    val synBand = a.getOrElse("syn-band", "0.10").toDouble
    val nQueries = a.getOrElse("queries", "50").toInt
    val k = a.getOrElse("k", "10").toInt
    // grids sized to the real table (2000 vectors at sf0.1): 64 lists of
    // ~31 vectors keep the cluster assumption meaningful; the synthetic
    // leg reuses the committed fixture's grid. Real-embedding cosines
    // sit far below the synthetic clusters' — the threshold grid must
    // straddle THEIR knee or every rate reads 0 (sf0.01 measured all-0
    // at the 0.90+ grid).
    val realNlists = Seq(16, 64)
    val realProbes = Seq(1, 2, 4, 16)
    val thresholds = a.getOrElse("thresholds", "0.5,0.7,0.9")
      .split(",").toSeq.map(_.trim.toDouble)

    def realEmb(dir: String): DataFrame = Tables.embeddings(spark, dir)

    val ivfPrim = ivf(realEmb(primary), nQueries, k, realNlists, realProbes)
    val ivfAlt = ivf(realEmb(alt), nQueries, k, realNlists, realProbes)
    val semPrim = sem(realEmb(primary), realNlists, thresholds)
    val semAlt = sem(realEmb(alt), realNlists, thresholds)

    // synthetic leg: the committed IvfCurveSpec fixture vs a fresh seed
    val synGrid = (Seq(64, 256), Seq(1, 4, 16, 64))
    def syn(seed: Long): Seq[(Int, Int, Double)] =
      ivf(Similarity.syntheticEmbeddings(spark, 20000L, 32, nClusters = 64,
        seed = seed, noise = 0.9), nQueries, k, synGrid._1, synGrid._2)
    val synFix = syn(20260812L)
    val synAlt = syn(20260817L)

    val violations = Seq.newBuilder[String]
    def bandCheck(tag: String, b: Double, p: Seq[(Int, Int, Double)],
                  q: Seq[(Int, Int, Double)]): Unit = {
      require(p.map(x => (x._1, x._2)) == q.map(x => (x._1, x._2)),
        s"$tag grids differ")
      p.zip(q).foreach { case ((nl, np, rp), (_, _, ra)) =>
        if (math.abs(rp - ra) > b)
          violations += f"$tag nlist=$nl nprobe=$np recall $rp%.4f vs $ra%.4f exceeds band $b"
      }
    }
    bandCheck("real", band, ivfPrim, ivfAlt)
    bandCheck("synthetic", synBand, synFix, synAlt)
    // SemDeDup contract on the alt corpus: monotone non-increasing in
    // threshold at fixed nlist
    realNlists.foreach { nl =>
      val byT = semAlt.filter(_._1 == nl).sortBy(_._2)
      byT.sliding(2).foreach {
        case Seq(lo, hi) =>
          if (hi._3 > lo._3 + 1e-12)
            violations += f"alt semdedup nlist=$nl not monotone: ${hi._2}%.2f drops ${hi._3}%.4f > ${lo._2}%.2f drops ${lo._3}%.4f"
        case _ => ()
      }
    }
    val v = violations.result()
    v.foreach(x => System.err.println(s"[quality-curves] VIOLATION: $x"))

    val json =
      s"""{"metric":"quality_curves_alt","primary":"$primary","alt":"$alt",""" +
      s""""band":$band,"syn_band":$synBand,"queries":$nQueries,"k":$k,""" +
      s""""thresholds":${thresholds.mkString("[", ",", "]")},""" +
      s""""ivf_real_primary_nlist_nprobe_recall":${fmtIvf(ivfPrim)},""" +
      s""""ivf_real_alt_nlist_nprobe_recall":${fmtIvf(ivfAlt)},""" +
      s""""ivf_syn_fixture_nlist_nprobe_recall":${fmtIvf(synFix)},""" +
      s""""ivf_syn_altseed_nlist_nprobe_recall":${fmtIvf(synAlt)},""" +
      s""""sem_primary_nlist_threshold_drop":${fmtSem(semPrim)},""" +
      s""""sem_alt_nlist_threshold_drop":${fmtSem(semAlt)},""" +
      s""""violations":${v.map(x => "\"" + Json.escape(x) + "\"").mkString("[", ",", "]")},""" +
      s""""ok":${v.isEmpty}}"""
    try spark.stop() catch { case _: Throwable => }
    println(json)
    if (v.nonEmpty) sys.exit(1)
  }
}
