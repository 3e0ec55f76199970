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

  test("two sessions racing the same build: exactly one commit wins, " +
    "both read identical rows (create-exclusive manifest claim)") {
    withTempRoot {
      // two genuinely concurrent materializations of the same
      // (family, corpus): the loser's LakeMerge.init throws
      // ConcurrentModificationException and must fall through to
      // reading the winner's table — never a duplicate commit, never
      // a crash. Builds are deterministic, so either interleaving
      // (loser-reads-winner, or second-call-sees-existing) yields
      // byte-identical rows.
      import spark.implicits._
      val corpus = java.nio.file.Files
        .createTempDirectory("graft_race_corpus").toString
      (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$corpus/marker.parquet")
      val results =
        new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = (0 until 4).map { i =>
        val t = new Thread(() => {
          try {
            gate.await()
            val s = spark.newSession()
            val df = ArtifactStore.materialize(s, "race.family", corpus) {
              val sp = s; import sp.implicits._
              (1L to 20L).map(k => (k, k * 7L)).toDF("k", "v")
            }
            results.add(df.collect().map(_.toString).toSeq.sorted)
          } catch { case e: Throwable => errors.add(e) }
        })
        t.start(); t
      }
      gate.countDown()
      threads.foreach(_.join(120000))
      assert(errors.isEmpty, s"racing builds must not throw: $errors")
      val all = results.toArray(Array.empty[Seq[String]])
      assert(all.length === 4)
      assert(all.distinct.length === 1,
        "all racers must observe identical artifact rows")
      // exactly one commit on disk: the table has a single v0 and no
      // stranded second manifest
      val dir = ArtifactStore.tableDir(spark, "race.family", corpus)
      val mf = new java.io.File(s"$dir/_manifest").listFiles()
        .map(_.getName).filter(_.startsWith("v")).sorted.toSeq
      assert(mf === Seq("v0.json"),
        s"expected exactly one committed version, found $mf")
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
