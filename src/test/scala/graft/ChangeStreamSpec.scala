package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{ChangeStream, LakeMerge}

/** L23 — the streaming consumer of the lake change feed: an
  * incremental (count, sum) view maintained under a VERSION WATERMARK
  * carried in the view table's own manifest. The contracts pinned
  * here are the r13 verdict's "Done" line: a view maintained by the
  * streaming feed ACROSS A RESTART equals the full recompute, replays
  * apply nothing, and version discovery rides the L20 checkpoint
  * (O(interval) metadata reads, not O(versions)).
  */
class ChangeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def srcBatch(rows: Seq[(Long, String, Long, Long)]): DataFrame =
    rows.toDF("k", "dt", "cust", "cents")

  private def recompute(srcDir: String): Seq[(Long, Long, Long)] =
    LakeMerge.read(spark, srcDir).groupBy("cust")
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  private def viewRows(viewDir: String): Seq[(Long, Long, Long)] =
    LakeMerge.read(spark, viewDir)
      .select("cust", "n_rows", "total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)

  private def tick(): String = {
    val in = tempDir("graft_cdcv_tick")
    Seq(1L).toDF("tick").coalesce(1).write.mode("overwrite").parquet(in)
    in
  }

  private def runOnce(srcDir: String, viewDir: String): Unit = {
    // a FRESH streaming query each call: new tick source, new
    // checkpoint — the restart the watermark must survive
    val q = ChangeStream.streamingView(
      spark.readStream.schema("tick LONG").parquet(tick()),
      srcDir, viewDir, appId = "specview", groupCol = "cust",
      sumCol = "cents", ckDir = tempDir("graft_cdcv_ck"))
    q.awaitTermination(120000)
    val stateless = Option(q.lastProgress)
      .forall(_.stateOperators.isEmpty)
    q.stop()
    assert(stateless, "watermarked view refresh must carry no stream state")
  }

  test("L23 streaming CDC view: bootstrap + two incremental advances " +
    "across RESTARTED queries equal the full recompute; a replayed " +
    "tick commits nothing") {
    val srcDir = tempDir("graft_cdcv_src")
    val viewDir = tempDir("graft_cdcv_view")
    // src v0: two customers
    LakeMerge.init(spark, srcDir, srcBatch(Seq(
      (1L, "2024-01", 100L, 10L), (2L, "2024-01", 100L, 20L),
      (3L, "2024-02", 200L, 5L))), "dt", "k", "cents")
    ChangeStream.initView(spark, viewDir, "cust", "n_rows", "total")
    runOnce(srcDir, viewDir) // bootstrap from the v0 snapshot
    assert(viewRows(viewDir) === recompute(srcDir))
    assert(LakeMerge.lastTxn(spark, viewDir, "cdc-view:specview")
      === Some(0L))
    // src v1: an update (k=2 doubles), an insert (new cust 300), a
    // delete (k=3 → cust 200 drops to zero and must LEAVE the view)
    LakeMerge.merge(spark, srcDir, srcBatch(Seq(
      (2L, "2024-01", 100L, 40L), (4L, "2024-02", 300L, 7L)))
      .withColumn("op", lit("upsert"))
      .unionByName(srcBatch(Seq((3L, "2024-02", 200L, 5L)))
        .withColumn("op", lit("delete"))),
      opCol = Some("op"))
    runOnce(srcDir, viewDir) // a RESTARTED query picks up v0→v1
    assert(viewRows(viewDir) === recompute(srcDir))
    assert(viewRows(viewDir).map(_._1) === Seq(100L, 300L),
      "the zero-count group must be deleted from the view")
    assert(LakeMerge.lastTxn(spark, viewDir, "cdc-view:specview")
      === Some(1L))
    // replay: nothing new committed upstream → the advance must be a
    // pure no-op (no view version, no watermark movement)
    val vBefore = LakeMerge.latestVersion(spark, viewDir)
    runOnce(srcDir, viewDir)
    assert(LakeMerge.latestVersion(spark, viewDir) === vBefore,
      "a tick with no new source versions must commit nothing")
    // src v2: another update — a third restarted query stays exact
    LakeMerge.merge(spark, srcDir, srcBatch(Seq(
      (1L, "2024-01", 100L, 11L))).withColumn("op", lit("upsert")),
      opCol = Some("op"))
    runOnce(srcDir, viewDir)
    assert(viewRows(viewDir) === recompute(srcDir))
  }

  test("L23 version discovery is O(interval): advancing over a " +
    "checkpointed many-commit source adds no full manifest listings") {
    val srcDir = tempDir("graft_cdcv_src2")
    val viewDir = tempDir("graft_cdcv_view2")
    LakeMerge.init(spark, srcDir, srcBatch(Seq(
      (1L, "2024-01", 100L, 10L))), "dt", "k", "cents")
    // 24 commits → past two checkpoint intervals (interval 10)
    (1 to 24).foreach { i =>
      LakeMerge.merge(spark, srcDir, srcBatch(Seq(
        (1L, "2024-01", 100L, 10L + i))).withColumn("op", lit("upsert")),
        opCol = Some("op"))
    }
    ChangeStream.initView(spark, viewDir, "cust", "n_rows", "total")
    ChangeStream.advanceView(spark, srcDir, viewDir, "specview2",
      "cust", "cents")
    assert(viewRows(viewDir) === recompute(srcDir))
    // incremental advance over ONE new commit: the version probe must
    // ride the checkpoint — zero full `_manifest` listings
    LakeMerge.merge(spark, srcDir, srcBatch(Seq(
      (2L, "2024-01", 100L, 3L))).withColumn("op", lit("upsert")),
      opCol = Some("op"))
    // the SOURCE's version discovery alone: zero listings (checkpoint
    // probe + tail existence checks only)
    val l0 = LakeMerge.metaListings
    LakeMerge.latestVersion(spark, srcDir)
    assert(LakeMerge.metaListings === l0,
      "source version discovery must probe the checkpoint, never " +
        "list the manifest directory")
    // the full advance: any listing growth must come from the YOUNG
    // view table (2 commits — below its first checkpoint interval,
    // so its lastTxn/commit metadata still lists), never from the
    // many-commit source. A handful of view-side listings is the
    // young-table constant; O(versions) source listings would be ≥
    // the 26-commit chain.
    val l1 = LakeMerge.metaListings
    ChangeStream.advanceView(spark, srcDir, viewDir, "specview2",
      "cust", "cents")
    assert(LakeMerge.metaListings - l1 <= 4,
      "the advance may list only the un-checkpointed view table's " +
        "own metadata, never walk the source's version chain")
    assert(viewRows(viewDir) === recompute(srcDir))
  }

  private def tableRows(dir: String): Set[(Long, String, Long, Long)] =
    LakeMerge.read(spark, dir).select("k", "dt", "cust", "cents")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet

  test("L28 CDC mirror: bootstrap + incremental advances keep a " +
    "row-level replica identical to the source; replays are no-ops; " +
    "a lagging mirror catches up over several source commits with " +
    "one net merge") {
    val srcDir = tempDir("graft_cdcm_src")
    val dstDir = tempDir("graft_cdcm_dst")
    LakeMerge.init(spark, srcDir, srcBatch(Seq(
      (1L, "2024-01", 100L, 10L), (2L, "2024-01", 100L, 20L),
      (3L, "2024-02", 200L, 5L))), "dt", "k", "cents")
    ChangeStream.initMirror(spark, srcDir, dstDir)
    // bootstrap from the snapshot
    assert(ChangeStream.advanceMirror(spark, srcDir, dstDir, "m1") === 0L)
    assert(tableRows(dstDir) === tableRows(srcDir))
    // replay: nothing committed
    val vAfterBootstrap = LakeMerge.latestVersion(spark, dstDir)
    assert(ChangeStream.advanceMirror(spark, srcDir, dstDir, "m1") === 0L)
    assert(LakeMerge.latestVersion(spark, dstDir) === vAfterBootstrap)
    // source evolves TWICE while the mirror lags: update k=1,
    // delete k=2 (cents-bumped tombstone via op merge), insert k=9
    LakeMerge.merge(spark, srcDir, srcBatch(Seq(
      (1L, "2024-01", 100L, 11L))))                              // v1
    LakeMerge.merge(spark, srcDir,
      srcBatch(Seq((9L, "2024-02", 300L, 7L))))                  // v2
    assert(ChangeStream.advanceMirror(spark, srcDir, dstDir, "m1") === 2L)
    assert(tableRows(dstDir) === tableRows(srcDir),
      "a lagging mirror catches up to the tip in one net advance")
    // a real delete flows through as a delete, not a ghost row
    val del = srcBatch(Seq((3L, "2024-02", 200L, 99L)))
      .withColumn("op", lit("delete"))
    LakeMerge.merge(spark, srcDir, del, opCol = Some("op"))       // v3
    // streaming form: a fresh query with a fresh checkpoint resumes
    // from the replica's own watermark (restart safety)
    val q = ChangeStream.streamingMirror(
      spark.readStream.schema("tick LONG").parquet(tick()),
      srcDir, dstDir, appId = "m1", ckDir = tempDir("graft_cdcm_ck"))
    q.awaitTermination(120000)
    q.stop()
    assert(tableRows(dstDir) === tableRows(srcDir))
    assert(!tableRows(dstDir).exists(_._1 == 3L), "the delete mirrored")
    assert(LakeMerge.lastTxn(spark, dstDir, "cdc-mirror:m1") === Some(3L))
  }

  test("L23/L28 CHAOS (r14 verdict #6): view + mirror maintainers " +
    "KILLED mid-advance and restarted from fresh checkpoints across " +
    "3+ source versions with a concurrent compaction settle exact at " +
    "every step — under the production RocksDB confs") {
    // the L13 model-check stance applied to the always-on consumers:
    // every advance commits rows + watermark in ONE manifest txn, so
    // a kill lands in exactly one of three states — before the commit
    // (nothing applied), after it (fully applied), or mid-backlog —
    // and a restarted query with a BRAND-NEW checkpoint (zero stream
    // state to recover) must settle to the full recompute regardless
    import graft.streaming.ReportStream
    val prev = ReportStream.productionStreamingConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    ReportStream.productionStreamingConfs
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val srcDir = tempDir("graft_chaos_src")
      val viewDir = tempDir("graft_chaos_view")
      val dstDir = tempDir("graft_chaos_dst")
      LakeMerge.init(spark, srcDir, srcBatch(Seq(
        (1L, "2024-01", 100L, 10L), (2L, "2024-01", 100L, 20L),
        (3L, "2024-02", 200L, 5L))), "dt", "k", "cents")
      ChangeStream.initView(spark, viewDir, "cust", "n_rows", "total")
      ChangeStream.initMirror(spark, srcDir, dstDir)
      def settleBoth(): Unit = {
        runOnce(srcDir, viewDir)
        val q = ChangeStream.streamingMirror(
          spark.readStream.schema("tick LONG").parquet(tick()),
          srcDir, dstDir, appId = "chaos-m",
          ckDir = tempDir("graft_chaos_mck"))
        q.awaitTermination(120000)
        q.stop()
        assert(viewRows(viewDir) === recompute(srcDir),
          "view must settle to the full recompute")
        assert(tableRows(dstDir) === tableRows(srcDir),
          "mirror must settle row-identical to the source")
      }
      settleBoth() // bootstrap settle
      for (round <- 1 to 3) {
        // a new source version each round: update + insert (+ delete
        // in the last round, so retraction rides the chaos too)
        LakeMerge.merge(spark, srcDir, srcBatch(Seq(
          (1L, "2024-01", 100L, 10L + round),
          (10L + round, "2024-02", 300L + round, round.toLong)))
          .withColumn("op", lit("upsert"))
          .unionByName(
            if (round == 3)
              srcBatch(Seq((2L, "2024-01", 100L, 20L)))
                .withColumn("op", lit("delete"))
            else srcBatch(Nil).withColumn("op", lit("upsert"))),
          opCol = Some("op"))
        // concurrent COMPACTION mid-chase: commits a source version
        // whose state diff is empty — the feed must apply net zero
        if (round == 2)
          LakeMerge.compact(spark, srcDir, targetRows = 2)
        // CHAOS: start both maintainers and kill them IN FLIGHT (no
        // await) — wherever the stop lands, the atomic rows+watermark
        // txn means no torn state can survive
        val kv = ChangeStream.streamingView(
          spark.readStream.schema("tick LONG").parquet(tick()),
          srcDir, viewDir, appId = "specview", groupCol = "cust",
          sumCol = "cents", ckDir = tempDir("graft_chaos_kck"))
        val km = ChangeStream.streamingMirror(
          spark.readStream.schema("tick LONG").parquet(tick()),
          srcDir, dstDir, appId = "chaos-m",
          ckDir = tempDir("graft_chaos_kmck"))
        kv.stop()
        km.stop()
        settleBoth() // restart from fresh checkpoints → exact settle
      }
      // final watermark: both consumed the tip exactly once
      val tip = LakeMerge.latestVersion(spark, srcDir).toLong
      assert(LakeMerge.lastTxn(spark, viewDir, "cdc-view:specview")
        === Some(tip))
      assert(LakeMerge.lastTxn(spark, dstDir, "cdc-mirror:chaos-m")
        === Some(tip))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AvailableNow catch-up twins (r15 verdict #6): a cron-gap " +
    "BACKLOG of source commits caught up in ONE run equals the " +
    "per-commit always-on cadence — view and mirror, RocksDB confs") {
    // the scheduled-cron production mode: no maintainer runs while the
    // source commits N times, then one Trigger.AvailableNow query
    // catches the whole backlog up and terminates. Identity to the
    // per-commit cadence is the contract that makes the two deployment
    // modes interchangeable — and the catch-up must price as ONE net
    // advance (one view/mirror commit), not a replay of N.
    import graft.streaming.ReportStream
    val prev = ReportStream.productionStreamingConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    ReportStream.productionStreamingConfs
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val srcDir = tempDir("graft_cu_src")
      val viewA = tempDir("graft_cu_viewA") // per-commit cadence
      val viewB = tempDir("graft_cu_viewB") // cron catch-up
      val mirA = tempDir("graft_cu_mirA")
      val mirB = tempDir("graft_cu_mirB")
      LakeMerge.init(spark, srcDir, srcBatch(Seq(
        (1L, "2024-01", 100L, 10L), (2L, "2024-01", 100L, 20L),
        (3L, "2024-02", 200L, 5L))), "dt", "k", "cents")
      ChangeStream.initView(spark, viewA, "cust", "n_rows", "total")
      ChangeStream.initView(spark, viewB, "cust", "n_rows", "total")
      ChangeStream.initMirror(spark, srcDir, mirA)
      ChangeStream.initMirror(spark, srcDir, mirB)
      def advanceAlwaysOn(): Unit = {
        runOnce(srcDir, viewA)
        val q = ChangeStream.streamingMirror(
          spark.readStream.schema("tick LONG").parquet(tick()),
          srcDir, mirA, appId = "cu", ckDir = tempDir("graft_cu_ck"))
        q.awaitTermination(120000)
        q.stop()
      }
      advanceAlwaysOn() // bootstrap after v0
      // the backlog: three commits with NO maintainer running for B
      LakeMerge.merge(spark, srcDir, srcBatch(Seq(
        (2L, "2024-01", 100L, 40L), (4L, "2024-02", 300L, 7L))))   // v1
      advanceAlwaysOn()
      LakeMerge.merge(spark, srcDir,
        srcBatch(Seq((3L, "2024-02", 200L, 5L)))
          .withColumn("op", lit("delete")), opCol = Some("op"))    // v2
      advanceAlwaysOn()
      LakeMerge.merge(spark, srcDir, srcBatch(Seq(
        (1L, "2024-01", 100L, 11L))))                              // v3
      advanceAlwaysOn()
      // cron mode: ONE AvailableNow run each, fresh checkpoints
      runOnce(srcDir, viewB)
      val qm = ChangeStream.streamingMirror(
        spark.readStream.schema("tick LONG").parquet(tick()),
        srcDir, mirB, appId = "cu", ckDir = tempDir("graft_cu_ckB"))
      qm.awaitTermination(120000)
      qm.stop()
      // identity: both cadences equal each other and the recompute
      assert(viewRows(viewA) === recompute(srcDir))
      assert(viewRows(viewB) === viewRows(viewA),
        "cron catch-up must equal the always-on cadence (view)")
      assert(tableRows(mirA) === tableRows(srcDir))
      assert(tableRows(mirB) === tableRows(mirA),
        "cron catch-up must equal the always-on cadence (mirror)")
      // priced as ONE net advance: B commits init + 1, A init + 4
      assert(LakeMerge.latestVersion(spark, viewB) === 1,
        "backlog catch-up must be one net view commit")
      assert(LakeMerge.latestVersion(spark, viewA) === 4)
      assert(LakeMerge.latestVersion(spark, mirB) === 1,
        "backlog catch-up must be one net mirror merge")
      // both watermarks sit at the tip
      val tip = LakeMerge.latestVersion(spark, srcDir).toLong
      for (d <- Seq(viewA, viewB))
        assert(LakeMerge.lastTxn(spark, d, "cdc-view:specview")
          === Some(tip))
      for (d <- Seq(mirA, mirB))
        assert(LakeMerge.lastTxn(spark, d, "cdc-mirror:cu") === Some(tip))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
