package graft

import org.apache.spark.sql.DataFrame

import graft.sources.ArtifactStore

/** The lake-resident artifact contract (r12 verdict item 1): a
  * standing artifact built in session A is an explicit LakeMerge
  * commit; a FRESH session serves it from the lake with ZERO rebuild
  * (no propagate rounds, no training jobs — asserted through the
  * build/load telemetry, which increments `lake_load` and leaves
  * `build_persist` untouched); and the served content is
  * value-identical to the built one. `spark.catalog.clearCache()`
  * still cannot drop an artifact — it is parquet now, not a plan
  * cache — and executor loss cannot kill it, which localCheckpoint
  * handles could never promise.
  */
class ArtifactStoreSpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def withTempRoot[T](f: => T): T = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_artstore").toString
    ArtifactStore.rootOverride = Some(tmp)
    try f
    finally {
      ArtifactStore.rootOverride = None
      Artifacts.clear(spark)
    }
  }

  test("cluster map: session A builds ONE lake commit; a fresh " +
    "session reads it back value-identical with zero rebuild") {
    withTempRoot {
      Artifacts.clear(spark, sf)
      val persists0 = Artifacts.countOf("dedup.clusterMap", "build_persist")
      val loads0 = ArtifactStore.loads("dedup.clusterMap")
      val a = operators.Dedup.clusterMap(spark, sf)
      val rows = sorted(a)
      assert(rows.nonEmpty)
      assert(Artifacts.countOf("dedup.clusterMap", "build_persist")
        === persists0 + 1, "the build must commit to the lake")
      // a FRESH session (new in-memory artifact identity): the lake,
      // not the propagate pipeline, must answer
      val s2 = spark.newSession()
      val b = operators.Dedup.clusterMap(s2, sf)
      assert(ArtifactStore.loads("dedup.clusterMap") === loads0 + 1,
        "fresh session must be served from the lake")
      assert(Artifacts.countOf("dedup.clusterMap", "build_persist")
        === persists0 + 1, "fresh session must NOT rebuild")
      assert(sorted(b) === rows, "lake round-trip must be exact")
      Artifacts.clear(s2)
    }
  }

  test("trained models (IVF codebook, BPE merges) round-trip the " +
    "lake bit-identically, priority order preserved") {
    withTempRoot {
      Artifacts.clear(spark, sf)
      val cb = operators.Similarity.ivfCodebook(spark, sf)
      val merges = operators.TextAnalysis.bpeMergeTable(spark, sf)
      assert(ArtifactStore.saves("similarity.ivfCodebook") >= 1)
      val s2 = spark.newSession()
      val cb2 = operators.Similarity.ivfCodebook(s2, sf)
      val merges2 = operators.TextAnalysis.bpeMergeTable(s2, sf)
      assert(cb2.map(_._1).toSeq === cb.map(_._1).toSeq)
      assert(cb2.map(_._2.toSeq).toSeq === cb.map(_._2.toSeq).toSeq,
        "centroid micro-vectors must round-trip exactly")
      assert(merges2.toSeq === merges.toSeq,
        "merge table must round-trip in learned priority order")
      assert(Artifacts.countOf("similarity.ivfCodebook", "lake_load") >= 1)
      Artifacts.clear(s2)
    }
  }

  test("clearCache() cannot drop a lake-resident artifact; a new " +
    "consumer still reads it without rebuilding") {
    withTempRoot {
      Artifacts.clear(spark, sf)
      val rows = sorted(operators.TextAnalysis.fpIndex(spark, sf))
      val persists = Artifacts.countOf("text.fpIndex", "build_persist")
      spark.catalog.clearCache()
      val s2 = spark.newSession()
      s2.catalog.clearCache()
      assert(sorted(operators.TextAnalysis.fpIndex(s2, sf)) === rows)
      assert(Artifacts.countOf("text.fpIndex", "build_persist")
        === persists, "clearCache must not force a rebuild")
      Artifacts.clear(s2)
    }
  }

  test("persistence off ('off' root): artifacts degrade to the " +
    "session-local eager handle and still serve consumers") {
    ArtifactStore.rootOverride = Some("off")
    try {
      Artifacts.clear(spark, sf)
      assert(!ArtifactStore.enabled)
      val a = operators.Dedup.clusterMap(spark, sf)
      val b = operators.Dedup.clusterMap(spark, sf)
      assert(a eq b, "in-memory handle still shared while live")
      assert(a.count() > 0)
    } finally {
      ArtifactStore.rootOverride = None
      Artifacts.clear(spark)
    }
  }

  test("vacuum: artifact tables expire by their own commit stamp; " +
    "a fresh consumer then rebuilds and re-persists") {
    withTempRoot {
      Artifacts.clear(spark, sf)
      val rows = sorted(operators.TextAnalysis.fpIndex(spark, sf))
      val persists = Artifacts.countOf("text.fpIndex", "build_persist")
      // an epoch cutoff expires nothing: every live table is younger
      assert(ArtifactStore.vacuum(spark, 0L) === Nil)
      val s2 = spark.newSession()
      assert(sorted(operators.TextAnalysis.fpIndex(s2, sf)) === rows)
      assert(Artifacts.countOf("text.fpIndex", "build_persist")
        === persists, "post-vacuum(0) reads must still be lake loads")
      // a future cutoff expires everything committed so far
      val deleted = ArtifactStore.vacuum(spark,
        System.currentTimeMillis() + 60000)
      assert(deleted.exists(_.contains("text.fpIndex")),
        s"expected the fpIndex table among $deleted")
      // a fresh consumer rebuilds and re-persists, value-identical
      val s3 = spark.newSession()
      assert(sorted(operators.TextAnalysis.fpIndex(s3, sf)) === rows)
      assert(Artifacts.countOf("text.fpIndex", "build_persist")
        === persists + 1, "vacuumed artifact must rebuild on demand")
      Artifacts.clear(s2); Artifacts.clear(s3)
    }
  }

  test("corpus fingerprint addressing: two corpora never share an " +
    "artifact table") {
    withTempRoot {
      val d1 = ArtifactStore.tableDir(spark, "dedup.clusterMap", sf)
      val d2 = ArtifactStore.tableDir(spark, "dedup.clusterMap",
        "/root/testdata/sf0.01")
      assert(d1 !== d2)
      val d3 = ArtifactStore.tableDir(spark, "dedup.gramIndex", sf)
      assert(d1 !== d3, "families are separate tables")
    }
  }
}
