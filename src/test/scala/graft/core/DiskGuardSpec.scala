package graft.core

import graft.SparkSuite

/** The scratch pre-flight (r12 verdict item 3). The refusal arithmetic
  * is pinned against the two measured calibration points: the sf100
  * pair materialization (~1.25e9 candidates, >56 GB scratch → refused)
  * and the sf30 one (~0.57e9, ~27 GB → allowed on this sandbox). */
class DiskGuardSpec extends SparkSuite {

  test("pairMaterializing names are real gated queries") {
    val known = graft.SparkEntry.queries.keySet
    val ghosts = DiskGuard.pairMaterializing.diff(known)
    assert(ghosts.isEmpty, s"DiskGuard lists unknown queries: $ghosts")
  }

  test("shortfall: refuses below 1.5x the estimate, allows at it, names the gap") {
    // sf100 calibration: 1.25e9 candidates x 48 B = 60 GB est, 90 GB need
    val est100 = 1249249500L * DiskGuard.BytesPerCandidate
    val msg = DiskGuard.shortfall(freeBytes = 56L * 1000 * 1000 * 1000,
      estimateBytes = est100)
    assert(msg.isDefined && msg.get.contains("GRAFT_DISK_GUARD=0"))
    assert(msg.get.contains("short"))
    // sf30 calibration: 0.569e9 candidates → ~27 GB est, ~41 GB need < 56 free
    val est30 = 568975050L * DiskGuard.BytesPerCandidate
    assert(DiskGuard.shortfall(56L * 1000 * 1000 * 1000, est30).isEmpty)
    // zero estimate (no pair queries, tiny input) never refuses
    assert(DiskGuard.shortfall(1L, 0L).isEmpty)
  }

  test("estimateBytes: pair pre-flight only runs when a pair query is requested") {
    val sf = "/root/testdata/sf0.001"
    val basic = DiskGuard.estimateBytes(spark, sf, Set("q_wordcount"))
    // non-pair estimate is the input footprint alone
    assert(basic === DiskGuard.dirBytes(sf))
    // a pair query adds candidates x 48 B on top
    val pair = DiskGuard.estimateBytes(spark, sf, Set("q_dedup_clusters"))
    assert(pair > basic)
  }

  test("usableBytes reports a positive number even for a not-yet-created out dir") {
    assert(DiskGuard.usableBytes("/root/repo/.tmp/does/not/exist/yet") > 0L)
    assert(DiskGuard.usableBytes("/root/repo") > 0L)
  }

  test("janitor sweeps only recognized, fully-idle, over-age scratch") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val root = Files.createTempDirectory("janitor-spec-root")
    def mk(name: String, ageMs: Long, freshChild: Boolean = false): java.nio.file.Path = {
      val d = Files.createDirectory(root.resolve(name))
      val f = Files.writeString(d.resolve("payload"), "x" * 1024)
      val old = FileTime.fromMillis(System.currentTimeMillis() - ageMs)
      Files.setLastModifiedTime(f, old); Files.setLastModifiedTime(d, old)
      if (freshChild) Files.writeString(d.resolve("live"), "y") // fresh mtime
      d
    }
    val day = 24L * 3600 * 1000
    val stale    = mk("graft-soak-dead", 3 * day)          // reclaim
    val sparkDir = mk("spark-0123-dead", 2 * day)          // reclaim
    val fresh    = mk("graft-soak-live", 1000)             // too young
    val active   = mk("blockmgr-active", 3 * day, freshChild = true) // live file inside
    val foreign  = mk("user-data-precious", 30 * day)      // not our naming

    val swept = DiskGuard.sweepStaleScratch(roots = Seq(root), maxAgeMs = day)
    assert(swept.map(_._1).toSet === Set(stale.toString, sparkDir.toString))
    assert(swept.forall(_._2 >= 1024L), s"reported bytes too small: $swept")
    assert(!Files.exists(stale) && !Files.exists(sparkDir))
    assert(Files.exists(fresh) && Files.exists(active) && Files.exists(foreign))
    DiskGuard.sweepStaleScratch(roots = Seq(root), maxAgeMs = 0) // cleanup rest is fine
    Files.walk(root).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => Files.deleteIfExists(p))
  }
}
