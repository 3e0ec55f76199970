package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.LakeMerge

/** The lakehouse MERGE target (sources/LakeMerge.scala): snapshot
  * manifests, partition-granular copy-on-write, optimistic
  * concurrency, time travel, vacuum, and manifest-level data
  * skipping. The oracle gate covers result-state correctness
  * (l_merge_upsert / l_merge_history); these specs pin the STORAGE
  * contracts a SQL oracle cannot see: which files a commit touches,
  * which files a read opens, what a racing writer observes.
  */
class LakeMergeSpec extends SparkSpec {

  import spark.implicits._

  private def tempTable(): String =
    Files.createTempDirectory("graft_lakespec").toString

  /** Tiny 3-partition table: dt in {d1,d2,d3}, keys 0-29, seq 0. */
  private def baseDf: DataFrame =
    (0 until 30).map(i =>
        (i.toLong, s"2024-0${1 + i % 3}", s"p$i", 0L))
      .toDF("k", "dt", "payload", "seq")

  private def rows(df: DataFrame): Set[(Long, String, String)] =
    df.select("k", "dt", "payload")
      .as[(Long, String, String)].collect().toSet

  test("init dedups to latest-per-(dt,key) and read returns it") {
    val dir = tempTable()
    // an out-of-order initial load: key 7 appears twice, seq 5 wins
    val messy = baseDf.unionByName(
      Seq((7L, "2024-02", "p7-late", 5L)).toDF("k", "dt", "payload", "seq"))
    val v = LakeMerge.init(spark, dir, messy, "dt", "k", "seq")
    assert(v === 0)
    val got = rows(LakeMerge.read(spark, dir))
    assert(got.size === 30)
    assert(got.contains((7L, "2024-02", "p7-late")))
    assert(!got.contains((7L, "2024-02", "p7")))
  }

  test("merge rewrites ONLY the batch's partitions: untouched entries " +
    "carry over verbatim, still pointing at version-0 files") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val m0 = LakeMerge.manifest(spark, dir)
    // batch hits only dt=2024-02 (keys ≡ 1 mod 3)
    val batch = Seq((1L, "2024-02", "p1-v2", 1L), (100L, "2024-02", "new", 1L))
      .toDF("k", "dt", "payload", "seq")
    val v = LakeMerge.merge(spark, dir, batch)
    assert(v === 1)
    val m1 = LakeMerge.manifest(spark, dir)
    // COW: the two unaffected partitions are the SAME entries (same
    // version dir, same file names) — zero bytes rewritten for them
    val untouched0 = m0.partitions.filter(_.dt != "2024-02")
    val untouched1 = m1.partitions.filter(_.dt != "2024-02")
    assert(untouched1.toSet === untouched0.toSet)
    assert(untouched1.forall(_.dir.startsWith("data/v0")))
    // the hit partition moved to the new version dir
    assert(m1.partitions.find(_.dt === "2024-02").get.dir.startsWith("data/v1"))
    // and the content is the upsert result
    val got = rows(LakeMerge.read(spark, dir))
    assert(got.contains((1L, "2024-02", "p1-v2")))
    assert(got.contains((100L, "2024-02", "new")))
    assert(got.size === 31)
  }

  test("delete ops remove their match; a partition deleted empty " +
    "drops out of the manifest") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // delete EVERY key of dt=2024-03 (keys ≡ 2 mod 3)
    val dels = (0 until 30).filter(_ % 3 == 2)
      .map(i => (i.toLong, "2024-03", "x", 1L, LakeMerge.Delete))
      .toDF("k", "dt", "payload", "seq", "op")
    LakeMerge.merge(spark, dir, dels, Some("op"))
    val m = LakeMerge.manifest(spark, dir)
    assert(!m.partitions.exists(_.dt === "2024-03"),
      "an emptied partition must leave the manifest")
    assert(rows(LakeMerge.read(spark, dir)).size === 20)
  }

  test("time travel: every prior snapshot stays exactly readable " +
    "after later merges") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val before = rows(LakeMerge.read(spark, dir))
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 1L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.merge(spark, dir,
      Seq((2L, "2024-03", "p2-v3", 2L)).toDF("k", "dt", "payload", "seq"))
    assert(rows(LakeMerge.read(spark, dir, Some(0))) === before)
    val v1 = rows(LakeMerge.read(spark, dir, Some(1)))
    assert(v1.contains((1L, "2024-02", "p1-v2")))
    assert(v1.contains((2L, "2024-03", "p2")))
  }

  test("optimistic concurrency: two writers merging against the same " +
    "read-version — the second commit loses and the winner's data " +
    "is intact") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // writer A computed against v0 and commits v1
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "pA", 1L)).toDF("k", "dt", "payload", "seq"),
      baseVersion = Some(0))
    // writer B ALSO computed against v0 — its v1 claim must lose
    intercept[java.util.ConcurrentModificationException] {
      LakeMerge.merge(spark, dir,
        Seq((2L, "2024-03", "pB", 1L)).toDF("k", "dt", "payload", "seq"),
        baseVersion = Some(0))
    }
    // the winner's snapshot is untouched by the failed commit
    assert(rows(LakeMerge.read(spark, dir)).contains((1L, "2024-02", "pA")))
    assert(!rows(LakeMerge.read(spark, dir)).exists(_._3 == "pB"))
    // B retries against the NEW latest and lands as v2
    assert(LakeMerge.merge(spark, dir,
      Seq((2L, "2024-03", "pB", 1L)).toDF("k", "dt", "payload", "seq")) === 2)
    assert(rows(LakeMerge.read(spark, dir)).contains((2L, "2024-03", "pB")))
  }

  test("vacuum drops only version dirs no retained snapshot " +
    "references — carried-forward COW dirs survive") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 1L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v3", 2L)).toDF("k", "dt", "payload", "seq"))
    // latest (v2) references data/v2 (its rewrite) AND data/v0 (the
    // two carried partitions) — v1's dir is the only dead one
    val deleted = LakeMerge.vacuum(spark, dir, keepLast = 1)
    assert(deleted.size === 1 && deleted.head.startsWith("data/v1"),
      s"only v1's attempt dir is dead: $deleted")
    val v0dir = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("v0"))
    assert(v0dir.nonEmpty && v0dir.forall(_.exists()),
      "carried-forward dirs must survive vacuum")
    // table still reads correctly after vacuum
    assert(rows(LakeMerge.read(spark, dir))
      .contains((1L, "2024-02", "p1-v3")))
  }

  test("readWhere opens only the selected partitions' files; a " +
    "fully-pruned read is an empty relation with the right schema") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val pruned = LakeMerge.readWhere(spark, dir, _ == "2024-01")
    val files = pruned.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("dt=2024-01")),
      s"manifest pruning must keep only dt=2024-01 files: ${files.toSeq}")
    assert(rows(pruned).forall(_._2 == "2024-01"))
    val none = LakeMerge.readWhere(spark, dir, _ => false)
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("k", "dt", "payload", "seq"))
  }

  test("changes: typed row-level diff — deletes carry the preimage, " +
    "inserts/updates the postimage, unchanged rows in a rewritten " +
    "partition are silent") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // one batch into dt=2024-02: update k=1, delete k=4, insert k=100
    // (k=7,10,...  of that partition stay untouched but the partition
    // IS rewritten — they must not appear in the feed)
    val batch = Seq(
      (1L, "2024-02", "p1-v2", 1L, LakeMerge.Upsert),
      (4L, "2024-02", "x", 1L, LakeMerge.Delete),
      (100L, "2024-02", "new", 1L, LakeMerge.Upsert))
      .toDF("k", "dt", "payload", "seq", "op")
    LakeMerge.merge(spark, dir, batch, Some("op"))
    val feed = LakeMerge.changes(spark, dir, 0)
    val got = feed.select("_change_type", "k", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(
      ("update", 1L, "p1-v2"),   // postimage
      ("delete", 4L, "p4"),      // preimage
      ("insert", 100L, "new")))
  }

  test("changes reads ONLY rewritten partitions: carried-over entries " +
    "cost zero I/O, proven by inputFiles") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 1L)).toDF("k", "dt", "payload", "seq"))
    val feed = LakeMerge.changes(spark, dir, 0)
    val files = feed.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("dt=2024-02")),
      s"carried partitions 2024-01/2024-03 must never be listed: ${files.toSeq}")
  }

  test("changes is a STATE diff: update-then-delete across the range " +
    "collapses to one delete; per-commit feeds see each step") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 1L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "x", 2L, LakeMerge.Delete))
        .toDF("k", "dt", "payload", "seq", "op"), Some("op"))
    val collapsed = LakeMerge.changes(spark, dir, 0, Some(2))
      .select("_change_type", "k", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(collapsed === Set(("delete", 1L, "p1")),
      "v0→v2 must collapse to one preimage delete")
    val step1 = LakeMerge.changes(spark, dir, 0, Some(1))
      .select("_change_type", "k", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(step1 === Set(("update", 1L, "p1-v2")))
    val step2 = LakeMerge.changes(spark, dir, 1, Some(2))
      .select("_change_type", "k", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(step2 === Set(("delete", 1L, "p1-v2")))
  }

  test("compact: key-sorted range-split rewrite — data identical, " +
    "file ranges tight and disjoint, point probes open one file") {
    val dir = tempTable()
    // ONE partition, 120 keys written in shuffled order so the
    // pre-compact file has no usable clustering
    val df = scala.util.Random.shuffle((0 until 120).toList)
      .map(i => (i.toLong, "D", s"p$i", 0L))
      .toDF("k", "dt", "payload", "seq")
    LakeMerge.init(spark, dir, df, "dt", "k", "seq")
    val before = rows(LakeMerge.read(spark, dir))
    val v = LakeMerge.compact(spark, dir, targetRows = 30)
    assert(v === 1)
    // pure re-layout: state unchanged
    assert(rows(LakeMerge.read(spark, dir)) === before)
    val e = LakeMerge.manifest(spark, dir).partitions.find(_.dt == "D").get
    assert(e.files.size === 4, s"120 rows / 30 target = 4 files: ${e.files}")
    // per-file ranges are tight and DISJOINT (the sort did its job)
    val ranges = e.fileStats.get.map(s => (s.minKey.get, s.maxKey.get))
      .sortBy(_._1)
    assert(ranges.map(_._1).head === 0L && ranges.map(_._2).last === 119L)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"file ranges must not overlap: $ranges")
    }
    // file-granular skipping: a POINT probe opens exactly one of the
    // 4 files (ranges are disjoint); a short span at most two (it may
    // straddle one sampled boundary)
    val point = LakeMerge.readForKeys(spark, dir, 40, 40)
    assert(point.inputFiles.length === 1,
      s"point probe should open 1 of 4 range-split files: ${point.inputFiles.toSeq}")
    assert(rows(point).map(_._1) === Set(40L))
    val span = LakeMerge.readForKeys(spark, dir, 40, 44)
    assert(span.inputFiles.length <= 2)
    assert(rows(span).map(_._1) === (40L to 44L).toSet)
  }

  test("compact scoped by `keep` carries unselected partitions over " +
    "verbatim, and the change feed across a compaction is EMPTY — " +
    "the diff sees state, not layout") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val m0 = LakeMerge.manifest(spark, dir)
    val v = LakeMerge.compact(spark, dir, targetRows = 5,
      keep = _ == "2024-02")
    assert(v === 1)
    val m1 = LakeMerge.manifest(spark, dir)
    assert(m1.partitions.filter(_.dt != "2024-02").toSet ===
      m0.partitions.filter(_.dt != "2024-02").toSet,
      "unselected partitions must carry over verbatim")
    assert(m1.partitions.find(_.dt == "2024-02").get.dir.startsWith("data/v1"))
    // compaction rewrote real files but changed NO row state
    assert(LakeMerge.changes(spark, dir, 0, Some(1)).count() === 0)
    // compacting nothing commits nothing
    assert(LakeMerge.compact(spark, dir, 5, keep = _ => false) === 1)
  }

  test("changes with updatePreimages: an update emits a retract/apply " +
    "pair (old then new values) — the rows an incremental aggregate " +
    "consumer needs") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 1L)).toDF("k", "dt", "payload", "seq"))
    val got = LakeMerge.changes(spark, dir, 0, updatePreimages = true)
      .select("_change_type", "k", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(
      ("update_preimage", 1L, "p1"),
      ("update_postimage", 1L, "p1-v2")))
  }

  test("streamingMergeBatch: a real stream merges batch-per-file, the " +
    "txn watermark makes an at-least-once replay a no-op, and a NEW " +
    "batch still applies — exactly-once end to end") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // three CDC files arriving on a stream, one micro-batch each
    val srcDir = Files.createTempDirectory("graft_lakestream").toString
    val ckpt = Files.createTempDirectory("graft_lakeckpt").toString
    Seq((1L, "2024-02", "s0", 1L)).toDF("k", "dt", "payload", "seq")
      .write.parquet(s"$srcDir/f0")
    Seq((2L, "2024-03", "s1", 1L)).toDF("k", "dt", "payload", "seq")
      .write.parquet(s"$srcDir/f1")
    Seq((200L, "2024-01", "s2", 1L)).toDF("k", "dt", "payload", "seq")
      .write.parquet(s"$srcDir/f2")
    val schema = baseDf.schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/f*")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(LakeMerge.streamingMergeBatch(dir, "appX"))
      .start()
    q.awaitTermination(120000)
    assert(LakeMerge.latestVersion(spark, dir) === 3,
      "three one-file micro-batches → three merge commits")
    assert(LakeMerge.lastTxn(spark, dir, "appX") === Some(2L))
    val got = rows(LakeMerge.read(spark, dir))
    assert(got.contains((1L, "2024-02", "s0")))
    assert(got.contains((2L, "2024-03", "s1")))
    assert(got.contains((200L, "2024-01", "s2")))
    // crash-replay of an already-durable batch: MUST be a no-op
    val replay = Seq((1L, "2024-02", "DOUBLE-APPLied", 9L))
      .toDF("k", "dt", "payload", "seq")
    LakeMerge.streamingMergeBatch(dir, "appX")(replay, 2L)
    assert(LakeMerge.latestVersion(spark, dir) === 3)
    assert(rows(LakeMerge.read(spark, dir)).contains((1L, "2024-02", "s0")))
    // a batch BEYOND the watermark applies normally
    LakeMerge.streamingMergeBatch(dir, "appX")(
      Seq((3L, "2024-01", "s3", 1L)).toDF("k", "dt", "payload", "seq"), 3L)
    assert(LakeMerge.latestVersion(spark, dir) === 4)
    assert(LakeMerge.lastTxn(spark, dir, "appX") === Some(3L))
    assert(rows(LakeMerge.read(spark, dir)).contains((3L, "2024-01", "s3")))
  }

  test("schema evolution: an evolveSchema merge widens the table — " +
    "pre-evolution files read as typed nulls with zero rewrites, old " +
    "snapshots keep the old schema, the change feed speaks the new one") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val m0 = LakeMerge.manifest(spark, dir)
    // batch hits only dt=2024-02 and carries a NEW column `score`
    val batch = Seq((1L, "2024-02", "p1-v2", 1L, 0.9),
        (100L, "2024-02", "new", 1L, 0.5))
      .toDF("k", "dt", "payload", "seq", "score")
    LakeMerge.merge(spark, dir, batch, evolveSchema = true)
    val m1 = LakeMerge.manifest(spark, dir)
    assert(m1.columns.last === "score")
    // COW: untouched partitions carried verbatim — evolution rewrote
    // NOTHING outside the batch's partition
    assert(m1.partitions.filter(_.dt != "2024-02").toSet ===
      m0.partitions.filter(_.dt != "2024-02").toSet)
    val now = LakeMerge.read(spark, dir)
    assert(now.columns.contains("score"))
    val scores = now.select("k", "dt", "score")
      .as[(Long, String, Option[Double])].collect()
      .map { case (k, d, sc) => (k, d) -> sc }.toMap
    assert(scores((1L, "2024-02")) === Some(0.9))
    assert(scores((100L, "2024-02")) === Some(0.5))
    // a pre-evolution row of the SAME rewritten partition: null score
    assert(scores((7L, "2024-02")) === None)
    // an untouched partition (only pre-evolution files): null score
    val old = LakeMerge.readWhere(spark, dir, _ == "2024-01")
    assert(old.columns.contains("score"))
    assert(old.select("score").as[Option[Double]].collect()
      .forall(_.isEmpty))
    // time travel: v0 still has the ORIGINAL schema
    assert(!LakeMerge.read(spark, dir, Some(0)).columns.contains("score"))
    // the feed diffs in the evolved schema: old side null-filled
    val feed = LakeMerge.changes(spark, dir, 0)
      .select("_change_type", "k", "score")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(feed === Set(("update", 1L, Some(0.9)),
      ("insert", 100L, Some(0.5))))
  }

  test("metaStats answers counts and key ranges from the manifest " +
    "alone — a LocalRelation, no data file opened — and the numbers " +
    "match the data") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val stats = LakeMerge.metaStats(spark, dir)
    assert(stats.inputFiles.isEmpty,
      "metadata query must not open any data file")
    val got = stats.as[(String, Long, Option[Long], Option[Long])]
      .collect().toSet
    val want = LakeMerge.read(spark, dir).groupBy("dt")
      .agg(count(lit(1)), min("k"), max("k"))
      .as[(String, Long, Option[Long], Option[Long])].collect().toSet
    assert(got === want, "manifest stats must exactly match the data")
  }

  test("deleteKeys (merge-on-read): zero data files rewritten — the " +
    "entry keeps its dir and files, gains vectors, counts stay exact " +
    "— and double-deletes cannot double-count") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val e0 = LakeMerge.manifest(spark, dir).partitions
      .find(_.dt == "2024-02").get
    // delete keys 1 and 4 (dt=2024-02) plus a key that does not exist
    val v = LakeMerge.deleteKeys(spark, dir,
      Seq((1L, "2024-02"), (4L, "2024-02"), (999L, "2024-02"))
        .toDF("k", "dt"))
    assert(v === 1)
    val e1 = LakeMerge.manifest(spark, dir).partitions
      .find(_.dt == "2024-02").get
    // merge-on-read contract: SAME data dir and files, vectors added
    assert(e1.dir === e0.dir && e1.files === e0.files)
    assert(e1.deleteFiles.exists(_.nonEmpty))
    // live count exact: only the 2 EXISTING keys counted
    assert(e1.rows === e0.rows - 2)
    val got = rows(LakeMerge.read(spark, dir))
    assert(got.size === 28)
    assert(!got.exists(r => r._1 == 1L || r._1 == 4L))
    // time travel: pre-delete snapshot still has them
    assert(rows(LakeMerge.read(spark, dir, Some(0))).size === 30)
    // re-deleting an already-deleted key is a no-op on the count
    LakeMerge.deleteKeys(spark, dir, Seq((1L, "2024-02")).toDF("k", "dt"))
    assert(LakeMerge.manifest(spark, dir).partitions
      .find(_.dt == "2024-02").get.rows === e0.rows - 2)
    // and metaStats (manifest-only) agrees with the data
    val stats = LakeMerge.metaStats(spark, dir)
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> t._2).toMap
    assert(stats("2024-02") === e0.rows - 2)
  }

  test("deleteKeys composes with the rest of the protocol: the feed " +
    "emits preimage deletes for a vector-only commit, merge/compact " +
    "apply vectors physically and clear them, vacuum keeps live " +
    "vector dirs") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.deleteKeys(spark, dir, Seq((1L, "2024-02")).toDF("k", "dt"))
    // the change feed sees the delete though no data file changed
    val feed = LakeMerge.changes(spark, dir, 0)
      .select("_change_type", "k", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(feed === Set(("delete", 1L, "p1")))
    // vacuum at this point must NOT reclaim the vector's dir
    assert(LakeMerge.vacuum(spark, dir, keepLast = 1) === Nil)
    assert(rows(LakeMerge.read(spark, dir)).size === 29)
    // a merge into the partition applies the vector physically
    LakeMerge.merge(spark, dir,
      Seq((100L, "2024-02", "new", 1L)).toDF("k", "dt", "payload", "seq"))
    val e = LakeMerge.manifest(spark, dir).partitions
      .find(_.dt == "2024-02").get
    assert(e.deleteFiles.forall(_.isEmpty),
      "a rewrite must clear the partition's vectors")
    val got = rows(LakeMerge.read(spark, dir))
    assert(!got.exists(_._1 == 1L) && got.exists(_._1 == 100L))
    // compact the rest and vacuum: table reads the same afterwards
    LakeMerge.compact(spark, dir, targetRows = 100)
    LakeMerge.vacuum(spark, dir, keepLast = 1)
    assert(rows(LakeMerge.read(spark, dir)) === got)
    assert(LakeMerge.manifest(spark, dir).partitions
      .forall(_.deleteFiles.forall(_.isEmpty)))
  }

  test("deleteKeys: a partition whose last live row is deleted drops " +
    "out of the manifest") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // dt=2024-03 holds keys ≡ 2 (mod 3): delete all ten
    val all03 = (0 until 30).filter(_ % 3 == 2)
      .map(i => (i.toLong, "2024-03")).toDF("k", "dt")
    LakeMerge.deleteKeys(spark, dir, all03)
    val m = LakeMerge.manifest(spark, dir)
    assert(!m.partitions.exists(_.dt == "2024-03"))
    assert(rows(LakeMerge.read(spark, dir)).size === 20)
  }

  test("Z-order compact: file bounding boxes are tight in BOTH " +
    "clustered dimensions, so probes on either column skip most " +
    "files — and a 2-D box probe prunes hardest") {
    val dir = tempTable()
    // a 64x64 grid: x and y independent — no single-column sort can
    // cluster both
    val df = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x * 64L + y, "D", x.toLong, y.toLong, 0L))
      .toDF("k", "dt", "x", "y", "seq")
    LakeMerge.init(spark, dir, df, "dt", "k", "seq")
    LakeMerge.compact(spark, dir, targetRows = 256,
      clusterCols = Seq("x", "y"))
    val e = LakeMerge.manifest(spark, dir).partitions.head
    assert(e.files.size >= 12, s"4096/256 ≈ 16 files, got ${e.files.size}")
    assert(e.colRanges.exists(_.map(_.col).toSet == Set("x", "y")))
    val px = LakeMerge.readForRanges(spark, dir, Map("x" -> (0L, 7L)))
    assert(px.inputFiles.length <= e.files.size / 2,
      s"x-probe must skip most of ${e.files.size} files: ${px.inputFiles.length}")
    assert(px.count() === 8 * 64)
    val py = LakeMerge.readForRanges(spark, dir, Map("y" -> (0L, 7L)))
    assert(py.inputFiles.length <= e.files.size / 2,
      s"y-probe must skip most of ${e.files.size} files: ${py.inputFiles.length}")
    assert(py.count() === 8 * 64)
    val pxy = LakeMerge.readForRanges(spark, dir,
      Map("x" -> (0L, 7L), "y" -> (0L, 7L)))
    assert(pxy.inputFiles.length <= px.inputFiles.length)
    assert(pxy.count() === 64)
    // the clustering declaration persists: a later CDC merge into the
    // partition keeps recording x/y stats, so range skipping stays
    // available after the rewrite instead of silently degrading
    LakeMerge.merge(spark, dir,
      Seq((5000L, "D", 9L, 9L, 1L)).toDF("k", "dt", "x", "y", "seq"))
    val e2 = LakeMerge.manifest(spark, dir).partitions.head
    assert(e2.dir.startsWith("data/v2"), "merge rewrote the partition")
    assert(e2.colRanges.exists(_.map(_.col).toSet == Set("x", "y")),
      "post-merge entries must keep the clustered columns' stats")
    assert(LakeMerge.readForRanges(spark, dir, Map("y" -> (9L, 9L)))
      .count() === 64 + 1)
  }

  test("a losing writer's attempt dir is an orphan that vacuum " +
    "reclaims; the winner's data is untouched") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "pA", 1L)).toDF("k", "dt", "payload", "seq"),
      baseVersion = Some(0))
    intercept[java.util.ConcurrentModificationException] {
      LakeMerge.merge(spark, dir,
        Seq((2L, "2024-03", "pB", 1L)).toDF("k", "dt", "payload", "seq"),
        baseVersion = Some(0))
    }
    // the loser WROTE its attempt dir before losing the commit race:
    // two v1-prefixed dirs exist, only one is referenced
    val dataDirs = new java.io.File(s"$dir/data").listFiles()
      .map(_.getName).filter(_.startsWith("v1")).toSet
    assert(dataDirs.size === 2, s"winner + loser attempt dirs: $dataDirs")
    val live = LakeMerge.manifest(spark, dir).partitions.map(_.dir).toSet
    val deleted = LakeMerge.vacuum(spark, dir, keepLast = 10)
    assert(deleted.size === 1 &&
      !live.contains(deleted.head), s"only the orphan goes: $deleted")
    assert(rows(LakeMerge.read(spark, dir)).contains((1L, "2024-02", "pA")))
  }

  test("concurrent writers GENUINELY racing (threads): the " +
    "create-exclusive commit serializes them, every loser's retry " +
    "lands exactly once, and vacuum only reclaims orphan attempts") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val writers = 4
    val batchesPerWriter = 3
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            start.await()
            (0 until batchesPerWriter).foreach { b =>
              val key = 1000L + w * 100 + b
              val batch = Seq((key, "2024-02", s"w$w-b$b", 1L))
                .toDF("k", "dt", "payload", "seq")
              // optimistic loop: read latest, attempt, retry on CME —
              // the client contract merge()'s scaladoc states
              var committed = false
              while (!committed) {
                try { LakeMerge.merge(spark, dir, batch); committed = true }
                catch {
                  case _: java.util.ConcurrentModificationException => ()
                }
              }
            }
          } catch { case t: Throwable => failures.add(t) }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"writer died: ${failures.peek()}")
    // exactly-once: every writer's every batch present, nothing lost
    // to a lost-update, version chain strictly linear
    val got = rows(LakeMerge.read(spark, dir))
    for (w <- 0 until writers; b <- 0 until batchesPerWriter)
      assert(got.contains((1000L + w * 100 + b, "2024-02", s"w$w-b$b")),
        s"writer $w batch $b was lost in the race")
    assert(got.size === 30 + writers * batchesPerWriter)
    val versions = LakeMerge.history(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(versions.map(_._1).toSeq ===
      (0 to writers * batchesPerWriter).toSeq, "linear version chain")
    assert(versions.forall { case (v, p) => p === v - 1 },
      "every commit's parent is its predecessor")
    // loser attempt dirs are unreferenced orphans; vacuum reclaims
    // them and the surviving table still reads identically
    LakeMerge.vacuum(spark, dir, keepLast = 1)
    assert(rows(LakeMerge.read(spark, dir)) === got)
  }

  test("readForKeys on a merge-on-read table: pruned-file reads still " +
    "anti-join pending vectors out") {
    val dir = tempTable()
    // keys clustered per partition so the probe prunes partition A
    val df = ((0 until 10).map(i => (i.toLong, "A", s"a$i", 0L)) ++
      (0 until 10).map(i => (100L + i, "B", s"b$i", 0L)))
      .toDF("k", "dt", "payload", "seq")
    LakeMerge.init(spark, dir, df, "dt", "k", "seq")
    LakeMerge.deleteKeys(spark, dir, Seq((102L, "B")).toDF("k", "dt"))
    val hit = LakeMerge.readForKeys(spark, dir, 100, 104)
    assert(hit.inputFiles.forall(f =>
      f.contains("dt=B") && !f.contains("dt=A")))
    assert(rows(hit).map(_._1) === Set(100L, 101L, 103L, 104L),
      "the deleted key must not resurface through a pruned read")
  }

  test("merge-on-read anti-join broadcasts the vector side: the data " +
    "side never shuffles for a small erasure") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.deleteKeys(spark, dir, Seq((1L, "2024-02")).toDF("k", "dt"))
    val p = LakeMerge.read(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"vector anti-join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a small erasure must not sort-merge the table:\n$p")
  }

  test("a watermarked feed consumer maintains a standing aggregate " +
    "across commits — including one pull spanning two collapsed " +
    "commits — and always matches the recompute") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // standing view: rows per dt, built once at v0
    def recompute(): Map[String, Long] =
      LakeMerge.read(spark, dir).groupBy("dt").count()
        .as[(String, Long)].collect().toMap
    var view = recompute()
    var lastSeen = 0
    def pullAndApply(): Unit = {
      val latest = LakeMerge.latestVersion(spark, dir)
      if (latest > lastSeen) {
        val deltas = LakeMerge
          .changes(spark, dir, lastSeen, Some(latest),
            updatePreimages = true)
          .select("_change_type", "dt")
          .as[(String, String)].collect()
        for ((ct, dt) <- deltas) ct match {
          case "insert"           => view += dt -> (view.getOrElse(dt, 0L) + 1)
          case "delete"           => view += dt -> (view(dt) - 1)
          case "update_preimage"  => view += dt -> (view(dt) - 1)
          case "update_postimage" => view += dt -> (view(dt) + 1)
        }
        view = view.filter(_._2 > 0)
        lastSeen = latest
      }
    }
    // commit 1: insert + update, pull immediately
    LakeMerge.merge(spark, dir,
      Seq((100L, "2024-01", "n1", 1L), (1L, "2024-02", "p1-v2", 1L))
        .toDF("k", "dt", "payload", "seq"))
    pullAndApply()
    assert(view === recompute(), "view diverged after commit 1")
    // commits 2+3 land BEFORE the next pull: the consumer sees one
    // collapsed diff (k=100 updated then deleted nets to one delete)
    LakeMerge.merge(spark, dir,
      Seq((100L, "2024-01", "n1-v2", 2L), (200L, "2024-03", "n2", 2L))
        .toDF("k", "dt", "payload", "seq"))
    LakeMerge.merge(spark, dir,
      Seq((100L, "2024-01", "x", 3L, LakeMerge.Delete))
        .toDF("k", "dt", "payload", "seq", "op"), Some("op"))
    pullAndApply()
    assert(view === recompute(), "view diverged after collapsed pull")
    assert(lastSeen === 3)
    // an idle pull is a no-op
    pullAndApply()
    assert(view === recompute())
  }

  test("CDC envelopes replicate a source table into the lake: " +
    "c/u/d/r images apply through MERGE, malformed payloads " +
    "dead-letter — nothing silent") {
    import graft.sources.CdcEnvelope
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val rowSchema = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("dt", "string").add("payload", "string")
    val envs = Seq(
      """{"op":"c","after":{"k":100,"dt":"2024-01","payload":"created"},"ts_ms":1,"seq":10}""",
      """{"op":"u","before":{"k":1,"dt":"2024-02","payload":"p1"},"after":{"k":1,"dt":"2024-02","payload":"updated"},"ts_ms":2,"seq":11}""",
      """{"op":"d","before":{"k":4,"dt":"2024-02","payload":"p4"},"ts_ms":3,"seq":12}""",
      """{"op":"r","after":{"k":101,"dt":"2024-03","payload":"snap"},"ts_ms":4}""",
      """not json at all""",
      """{"op":"x","after":{"k":9,"dt":"2024-01","payload":"nope"},"seq":13}""",
      """{"op":"d","after":{"k":9,"dt":"2024-01","payload":"noimage"},"seq":14}""",
      """{"op":"c","after":{"k":9,"dt":"2024-01","payload":"unordered"}}""")
      .toDF("json")
    val batch = CdcEnvelope.toMergeBatch(envs, "json", rowSchema)
      .withColumnRenamed("_cdc_seq", "seq")
    assert(batch.count() === 4)
    // the snapshot-read without seq fell back to ts_ms
    assert(batch.filter(col("k") === 101).select("seq")
      .head().getLong(0) === 4L)
    val dead = CdcEnvelope.deadLetters(envs, "json", rowSchema)
      .as[String].collect().toSet
    // rejects: unparseable, unknown op, missing image, and the
    // envelope with NEITHER seq nor ts_ms (no place in the MERGE
    // total order — a default would make same-key winners
    // nondeterministic; r11 advice)
    assert(dead.size === 4 && dead.exists(_.startsWith("not json")),
      s"bad payloads must surface, not vanish: $dead")
    assert(dead.exists(_.contains("unordered")),
      "an envelope with no log position must dead-letter")
    LakeMerge.merge(spark, dir, batch, Some("_cdc_op"))
    val got = rows(LakeMerge.read(spark, dir))
    assert(got.contains((100L, "2024-01", "created")))
    assert(got.contains((1L, "2024-02", "updated")))
    assert(got.contains((101L, "2024-03", "snap")))
    assert(!got.exists(r => r._1 == 4L && r._2 == "2024-02"),
      "the delete image must remove its row")
    assert(got.size === 30 + 2 - 1)
  }

  test("the full replication pipe as a stream: envelope files → parse " +
    "→ exactly-once MERGE, dead letters appended per batch — and a " +
    "replayed batch double-applies neither") {
    import graft.sources.CdcEnvelope
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val rowSchema = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("dt", "string").add("payload", "string")
    val srcDir = Files.createTempDirectory("graft_cdcstream").toString
    val ckpt = Files.createTempDirectory("graft_cdcckpt").toString
    val dlqDir = Files.createTempDirectory("graft_cdcdlq").toString
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/f0.json"),
      """{"op":"c","after":{"k":100,"dt":"2024-01","payload":"c0"},"seq":10}""" +
        "\n" + """garbage line""")
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/f1.json"),
      """{"op":"d","before":{"k":1,"dt":"2024-02","payload":"p1"},"seq":20}""")
    val apply: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (raw, batchId) => {
        CdcEnvelope.deadLetters(raw, "value", rowSchema)
          .write.mode("append").parquet(dlqDir)
        LakeMerge.streamingMergeBatch(dir, "cdcApp",
          opCol = Some("_cdc_op"))(
          CdcEnvelope.toMergeBatch(raw, "value", rowSchema)
            .withColumnRenamed("_cdc_seq", "seq"), batchId)
      }
    val q = spark.readStream.option("maxFilesPerTrigger", 1)
      .text(s"$srcDir/*.json")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(apply)
      .start()
    q.awaitTermination(120000)
    val got = rows(LakeMerge.read(spark, dir))
    assert(got.contains((100L, "2024-01", "c0")))
    assert(!got.exists(r => r._1 == 1L && r._2 == "2024-02"))
    assert(got.size === 30)
    assert(LakeMerge.lastTxn(spark, dir, "cdcApp") === Some(1L))
    val dead = spark.read.parquet(dlqDir).as[String].collect().toSeq
    assert(dead === Seq("garbage line"))
    // replay batch 1 with different content: the watermark rejects it
    val v = LakeMerge.latestVersion(spark, dir)
    apply(Seq("""{"op":"c","after":{"k":999,"dt":"2024-01","payload":"dup"},"seq":99}""")
      .toDF("value"), 1L)
    assert(LakeMerge.latestVersion(spark, dir) === v)
    assert(!rows(LakeMerge.read(spark, dir)).exists(_._1 == 999L))
  }

  test("merge REFUSES a batch with unhandled extra columns — the " +
    "forgotten-opCol mistake fails loudly instead of applying " +
    "deletes as upserts") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val batch = Seq((1L, "2024-02", "x", 1L, LakeMerge.Delete))
      .toDF("k", "dt", "payload", "seq", "op") // op NOT passed as opCol
    val e = intercept[IllegalArgumentException] {
      LakeMerge.merge(spark, dir, batch)
    }
    assert(e.getMessage.contains("op"))
    // handled explicitly, the same batch applies fine
    LakeMerge.merge(spark, dir, batch, Some("op"))
    assert(!rows(LakeMerge.read(spark, dir)).exists(_._1 == 1L))
  }

  test("history lists every retained snapshot from the manifests " +
    "alone; age-based expiry drops old snapshots, never the latest") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 1L)).toDF("k", "dt", "payload", "seq"),
      txn = Some("app" -> 0L))
    LakeMerge.merge(spark, dir,
      Seq((2L, "2024-03", "p2-v3", 2L)).toDF("k", "dt", "payload", "seq"),
      txn = Some("app" -> 1L))
    val h = LakeMerge.history(spark, dir)
    assert(h.inputFiles.isEmpty, "history must not open data files")
    val rows3 = h.collect()
    assert(rows3.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    assert(rows3.map(_.getInt(1)).toSeq === Seq(-1, 0, 1))
    assert(rows3.forall(!_.isNullAt(2)), "commit stamps must be present")
    assert(rows3.map(_.getLong(4)).toSeq === Seq(30L, 30L, 30L))
    assert(rows3.last.getString(5) === "app=1")
    // expire everything committed before "the future": only the
    // latest survives, by contract
    val expired = LakeMerge.vacuumExpired(spark, dir,
      System.currentTimeMillis() + 60000)
    assert(expired === Seq(0, 1))
    assert(LakeMerge.history(spark, dir).collect()
      .map(_.getInt(0)).toSeq === Seq(2))
    // latest still reads; expired versions are gone
    assert(rows(LakeMerge.read(spark, dir))
      .contains((2L, "2024-03", "p2-v3")))
    intercept[Exception] { LakeMerge.read(spark, dir, Some(0)).count() }
    // idempotent: nothing left to expire
    assert(LakeMerge.vacuumExpired(spark, dir,
      System.currentTimeMillis() + 60000) === Nil)
  }

  test("CHECK constraints: ADD validates existing data, violating " +
    "merges are refused before any write, deletes cannot violate, " +
    "and DROP lifts the veto") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // a constraint today's data violates cannot be declared
    intercept[LakeMerge.ConstraintViolation] {
      LakeMerge.addConstraint(spark, dir, "k_small", "k < 10")
    }
    // metadata-only commit: same partitions, new version
    val m0 = LakeMerge.manifest(spark, dir)
    assert(LakeMerge.addConstraint(spark, dir, "k_nonneg", "k >= 0") === 1)
    assert(LakeMerge.manifest(spark, dir).partitions === m0.partitions)
    // a violating batch is refused with the constraint's name and an
    // example row — and NOTHING was committed
    val ex = intercept[LakeMerge.ConstraintViolation] {
      LakeMerge.merge(spark, dir,
        Seq((-5L, "2024-01", "bad", 1L)).toDF("k", "dt", "payload", "seq"))
    }
    assert(ex.name === "k_nonneg" && ex.count === 1)
    assert(LakeMerge.latestVersion(spark, dir) === 1)
    // deletes cannot violate a row constraint
    LakeMerge.merge(spark, dir,
      Seq((0L, "2024-01", "x", 1L, LakeMerge.Delete))
        .toDF("k", "dt", "payload", "seq", "op"), Some("op"))
    // a clean batch applies and carries the constraint forward
    LakeMerge.merge(spark, dir,
      Seq((500L, "2024-01", "ok", 2L)).toDF("k", "dt", "payload", "seq"))
    intercept[LakeMerge.ConstraintViolation] {
      LakeMerge.merge(spark, dir,
        Seq((-6L, "2024-01", "bad", 3L)).toDF("k", "dt", "payload", "seq"))
    }
    // DROP lifts the veto
    LakeMerge.dropConstraint(spark, dir, "k_nonneg")
    LakeMerge.merge(spark, dir,
      Seq((-6L, "2024-01", "now-ok", 4L)).toDF("k", "dt", "payload", "seq"))
    assert(rows(LakeMerge.read(spark, dir))
      .contains((-6L, "2024-01", "now-ok")))
  }

  test("restore rolls back to an earlier snapshot as a metadata-only " +
    "commit: zero rewrites, linear auditable history, and vacuum " +
    "keeps the revived files alive") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    val before = rows(LakeMerge.read(spark, dir))
    // the "bad" merge restore will undo
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "oops", 1L), (100L, "2024-01", "oops2", 1L))
        .toDF("k", "dt", "payload", "seq"))
    assert(rows(LakeMerge.read(spark, dir)) !== before)
    val v = LakeMerge.restore(spark, dir, 0)
    assert(v === 2)
    assert(rows(LakeMerge.read(spark, dir)) === before)
    // metadata-only: the restored entries ARE v0's entries
    assert(LakeMerge.manifest(spark, dir).partitions.toSet ===
      LakeMerge.manifest(spark, dir, Some(0)).partitions.toSet)
    // history stays linear — the bad merge remains auditable
    assert(LakeMerge.history(spark, dir).collect()
      .map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    // vacuum to the latest: the revived v0 dirs must survive
    LakeMerge.vacuum(spark, dir, keepLast = 1)
    assert(rows(LakeMerge.read(spark, dir)) === before)
  }

  test("readForKeys skips partitions whose key-range stats exclude " +
    "the probe — data skipping without opening a file") {
    val dir = tempTable()
    // keys are clustered per partition: dt A holds 0-9, B 100-109
    val df = ((0 until 10).map(i => (i.toLong, "A", s"a$i", 0L)) ++
      (0 until 10).map(i => (100L + i, "B", s"b$i", 0L)))
      .toDF("k", "dt", "payload", "seq")
    LakeMerge.init(spark, dir, df, "dt", "k", "seq")
    val hit = LakeMerge.readForKeys(spark, dir, 100, 104)
    assert(hit.inputFiles.forall(_.contains("dt=B")),
      "stats must skip partition A entirely")
    assert(rows(hit).map(_._1) === (100L to 104L).toSet)
  }

  test("the two retention APIs compose: vacuum(keepLast) after " +
    "vacuumExpired and vice versa treat already-missing manifests " +
    "as expired instead of crashing") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    (1 to 3).foreach { i =>
      LakeMerge.merge(spark, dir,
        Seq((i.toLong, "2024-02", s"p$i-v$i", i.toLong))
          .toDF("k", "dt", "payload", "seq"))
    }
    // count-based retention first: keeps v2+v3, drops manifests 0-1
    LakeMerge.vacuum(spark, dir, keepLast = 2)
    assert(LakeMerge.history(spark, dir).collect()
      .map(_.getInt(0)).toSeq === Seq(2, 3))
    // age-based expiry next: must skip the already-gone manifests
    // (r11 advice: this crashed with FileNotFoundException), expire
    // v2, and retain the latest
    val expired = LakeMerge.vacuumExpired(spark, dir,
      System.currentTimeMillis() + 60000)
    assert(expired === Seq(2))
    assert(LakeMerge.history(spark, dir).collect()
      .map(_.getInt(0)).toSeq === Seq(3))
    // and count-based again over the hole-y history: no crash, reads fine
    assert(LakeMerge.vacuum(spark, dir, keepLast = 2) === Nil)
    assert(rows(LakeMerge.read(spark, dir))
      .contains((3L, "2024-02", "p3-v3")))
    // the other order on a fresh table: expire middles, then vacuum
    val dir2 = tempTable()
    LakeMerge.init(spark, dir2, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir2,
      Seq((1L, "2024-02", "x", 1L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.vacuumExpired(spark, dir2, System.currentTimeMillis() + 60000)
    assert(LakeMerge.vacuum(spark, dir2, keepLast = 5) === Nil)
    assert(rows(LakeMerge.read(spark, dir2)).contains((1L, "2024-02", "x")))
  }

  test("restore re-validates CURRENT constraints over the restored " +
    "snapshot: rolling back to data that violates a since-declared " +
    "CHECK is refused") {
    val dir = tempTable()
    val withBad = baseDf.unionByName(
      Seq((-1L, "2024-01", "neg", 0L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.init(spark, dir, withBad, "dt", "k", "seq")       // v0
    LakeMerge.merge(spark, dir,                                  // v1
      Seq((-1L, "2024-01", "neg", 1L, LakeMerge.Delete))
        .toDF("k", "dt", "payload", "seq", "op"), Some("op"))
    LakeMerge.addConstraint(spark, dir, "k_nonneg", "k >= 0")    // v2
    val latest = LakeMerge.manifest(spark, dir).version
    // v0 holds k = -1 — restoring it would violate k_nonneg
    intercept[LakeMerge.ConstraintViolation] {
      LakeMerge.restore(spark, dir, 0)
    }
    assert(LakeMerge.manifest(spark, dir).version === latest,
      "a refused restore must not commit")
    // v1 satisfies the constraint: restore proceeds
    LakeMerge.restore(spark, dir, 1)
    assert(!rows(LakeMerge.read(spark, dir)).exists(_._1 < 0))
  }

  test("column mapping: RENAME is metadata-only — old files serve the " +
    "new logical name, time travel keeps the old one, changes() diffs " +
    "in the current mapping, compaction and merges keep working") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")            // v0
    val v0Files = LakeMerge.manifest(spark, dir).partitions
      .flatMap(e => e.files.map(f => s"${e.dir}/$f")).toSet
    LakeMerge.renameColumn(spark, dir, "payload", "note")           // v1
    // metadata-only: exactly the same data files as v0
    assert(LakeMerge.manifest(spark, dir).partitions
      .flatMap(e => e.files.map(f => s"${e.dir}/$f")).toSet === v0Files)
    // pre-rename files read under the NEW logical name
    val r1 = LakeMerge.read(spark, dir)
    assert(r1.columns.toSeq === Seq("k", "dt", "note", "seq"))
    assert(r1.filter(col("k") === 7).select("note")
      .head().getString(0) === "p7")
    // time travel: v0 still answers under its own (old) name
    assert(LakeMerge.read(spark, dir, Some(0)).columns.contains("payload"))
    // a merge under the new name mixes post-rename files with
    // pre-rename ones transparently
    LakeMerge.merge(spark, dir,                                     // v2
      Seq((1L, "2024-02", "p1-renamed", 1L))
        .toDF("k", "dt", "note", "seq"))
    val got = rows2(LakeMerge.read(spark, dir))
    assert(got.contains((1L, "2024-02", "p1-renamed")))
    assert(got.contains((7L, "2024-02", "p7")))
    // change feed across the rename speaks the CURRENT mapping
    val ch = LakeMerge.changes(spark, dir, 0)
    assert(ch.columns.contains("note") && !ch.columns.contains("payload"))
    assert(ch.filter(col("_change_type") === "update").select("note")
      .head().getString(0) === "p1-renamed")
    // physical re-layout after a rename: compact rewrites under the
    // ORIGINAL physical names and reads stay logical
    LakeMerge.compact(spark, dir, targetRows = 1000)                // v3
    assert(rows2(LakeMerge.read(spark, dir)) === got)
    // guards: structural columns and constraint-referenced columns
    intercept[IllegalArgumentException] {
      LakeMerge.renameColumn(spark, dir, "k", "key2")
    }
    LakeMerge.addConstraint(spark, dir, "note_set", "note IS NOT NULL")
    intercept[IllegalArgumentException] {
      LakeMerge.renameColumn(spark, dir, "note", "note2")
    }
    LakeMerge.dropConstraint(spark, dir, "note_set")
  }

  private def rows2(df: DataFrame): Set[(Long, String, String)] =
    df.select("k", "dt", "note")
      .as[(Long, String, String)].collect().toSet

  test("column mapping: DROP retires the physical column; a re-added " +
    "column of the same name is a FRESH identity, never resurrecting " +
    "pre-drop values") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")            // v0
    LakeMerge.dropColumn(spark, dir, "payload")                     // v1
    val r1 = LakeMerge.read(spark, dir)
    assert(!r1.columns.contains("payload"))
    assert(r1.count() === 30)
    // time travel: the dropped column is still there in v0
    assert(LakeMerge.read(spark, dir, Some(0)).columns.contains("payload"))
    // re-add the same logical name via additive evolution: old rows
    // must read NULL (fresh identity), not their pre-drop values
    LakeMerge.merge(spark, dir,                                     // v2
      Seq((1L, "2024-02", 1L, "fresh")).toDF("k", "dt", "seq", "payload"),
      evolveSchema = true)
    val r2 = LakeMerge.read(spark, dir)
    assert(r2.filter(col("k") === 1).select("payload")
      .head().getString(0) === "fresh")
    assert(r2.filter(col("k") === 7).select("payload").head().isNullAt(0),
      "pre-drop values must NOT resurface under the re-added column")
    // and the fresh column round-trips through later merges
    LakeMerge.merge(spark, dir,
      Seq((7L, "2024-02", 2L, "p7-new")).toDF("k", "dt", "seq", "payload"))
    assert(LakeMerge.read(spark, dir).filter(col("k") === 7)
      .select("payload").head().getString(0) === "p7-new")
    // structural guard holds for drop too
    intercept[IllegalArgumentException] {
      LakeMerge.dropColumn(spark, dir, "seq")
    }
  }

  test("column mapping: DROP then RENAME onto the dropped name — " +
    "pre-drop files still physically hold the retired column, yet " +
    "reads, merges, and compaction stay unambiguous (r12 advice)") {
    val dir = tempTable()
    val df0 = baseDf.withColumn("note", concat(lit("n"), col("k")))
    LakeMerge.init(spark, dir, df0, "dt", "k", "seq")               // v0
    LakeMerge.dropColumn(spark, dir, "note")                        // v1
    // rebind the retired NAME to payload's bytes: every v0 file now
    // physically holds BOTH a `note` (retired) and a `payload`
    // (renamed to logical `note`) column — the ambiguity trap
    LakeMerge.renameColumn(spark, dir, "payload", "note")           // v2
    val r = LakeMerge.read(spark, dir)
    assert(r.columns.toSeq === Seq("k", "dt", "note", "seq"))
    // values come from payload's physical bytes, not the retired ones
    assert(r.filter(col("k") === 7).select("note")
      .head().getString(0) === "p7")
    // merge + compact keep working over the mixed file population
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "n1-new", 9L)).toDF("k", "dt", "note", "seq"))
    LakeMerge.compact(spark, dir, targetRows = 1000)
    val got = rows2(LakeMerge.read(spark, dir))
    assert(got.contains((1L, "2024-02", "n1-new")))
    assert(got.contains((7L, "2024-02", "p7")))
    // time travel: v0 still answers under its own names and values
    val v0 = LakeMerge.read(spark, dir, Some(0))
    assert(v0.columns.contains("payload") && v0.columns.contains("note"))
    assert(v0.filter(col("k") === 7).select("note")
      .head().getString(0) === "n7")
  }

  test("column mapping: swap-like rename chain (a→tmp, b→a, tmp→b) — " +
    "the atomic logical projection is order-independent (r12 advice)") {
    val dir = tempTable()
    val df0 = baseDf.withColumn("note", concat(lit("n"), col("k")))
    LakeMerge.init(spark, dir, df0, "dt", "k", "seq")               // v0
    LakeMerge.renameColumn(spark, dir, "payload", "tmp")            // v1
    LakeMerge.renameColumn(spark, dir, "note", "payload")           // v2
    LakeMerge.renameColumn(spark, dir, "tmp", "note")               // v3
    // payload and note have SWAPPED: logical `payload` now binds the
    // physical bytes of note and vice versa
    val r = LakeMerge.read(spark, dir)
    val k7 = r.filter(col("k") === 7).select("payload", "note").head()
    assert(k7.getString(0) === "n7" && k7.getString(1) === "p7")
    // merges under the swapped names land on the right bytes
    LakeMerge.merge(spark, dir,
      Seq((7L, "2024-02", "N7", "P7", 9L))
        .toDF("k", "dt", "payload", "note", "seq"))
    val k7b = LakeMerge.read(spark, dir)
      .filter(col("k") === 7).select("payload", "note").head()
    assert(k7b.getString(0) === "N7" && k7b.getString(1) === "P7")
    // and untouched keys still read swapped v0 bytes post-merge
    val k3 = LakeMerge.read(spark, dir)
      .filter(col("k") === 3).select("payload", "note").head()
    assert(k3.getString(0) === "n3" && k3.getString(1) === "p3")
  }

  test("maintain(): manifest-driven — MOR debt compacts only the " +
    "debtor partition, dir scatter compacts the table into one dir, " +
    "a healthy table is a zero-I/O no-op, retention applies") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // a pending deletion vector = MOR debt on 2024-02 only
    LakeMerge.deleteKeys(spark, dir,
      Seq((1L, "2024-02")).toDF("k", "dt"))
    val before = rows(LakeMerge.read(spark, dir))
    val m0 = LakeMerge.manifest(spark, dir)
    val untouched = m0.partitions.filter(_.dt != "2024-02").toSet
    val done = LakeMerge.maintain(spark, dir, targetRows = 1000)
    assert(done.compactedPartitions === Seq("2024-02"),
      s"only the MOR-debt partition compacts: $done")
    val m1 = LakeMerge.manifest(spark, dir)
    // COW: healthy partitions carried over verbatim; the debt is paid
    assert(m1.partitions.filter(_.dt != "2024-02").toSet === untouched)
    assert(m1.partitions.forall(_.deleteFiles.forall(_.isEmpty)))
    assert(rows(LakeMerge.read(spark, dir)) === before)
    // scatter: rewrite each partition once → 3 live version dirs
    for (dt <- Seq("2024-01", "2024-02", "2024-03"))
      LakeMerge.merge(spark, dir,
        Seq((2000L, dt, s"touch$dt", 1L)).toDF("k", "dt", "payload", "seq"))
    assert(LakeMerge.manifest(spark, dir).partitions
      .map(_.dir).distinct.size === 3)
    val after = rows(LakeMerge.read(spark, dir))
    val swept = LakeMerge.maintain(spark, dir, targetRows = 1000,
      maxLiveDirs = 2,
      expireOlderThanMs = Some(System.currentTimeMillis() + 60000))
    assert(swept.compactedPartitions.size === 3,
      s"scatter compacts the whole table: $swept")
    assert(LakeMerge.manifest(spark, dir).partitions
      .map(_.dir).distinct.size === 1, "one fresh dir after the cure")
    assert(swept.expired.nonEmpty)
    assert(LakeMerge.history(spark, dir).count() === 1)
    assert(rows(LakeMerge.read(spark, dir)) === after)
    // healthy: next tick decides no-op from the manifest alone
    val noop = LakeMerge.maintain(spark, dir, targetRows = 1000,
      maxLiveDirs = 2)
    assert(noop.compactedVersion.isEmpty &&
      noop.compactedPartitions.isEmpty && noop.expired.isEmpty)
  }

  test("timestamp time travel: readAsOf resolves an instant to the " +
    "latest retained snapshot at or before it, with strictly " +
    "monotonic commit stamps") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")           // v0
    LakeMerge.merge(spark, dir,                                     // v1
      Seq((1L, "2024-02", "p1-v1", 1L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.merge(spark, dir,                                     // v2
      Seq((1L, "2024-02", "p1-v2", 2L)).toDF("k", "dt", "payload", "seq"))
    val stamps = LakeMerge.history(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getTimestamp(2).getTime).toMap
    // stamps are strictly increasing even if commits shared a
    // clock tick — the uniqueness guarantee behind as-of resolution
    assert(stamps(0) < stamps(1) && stamps(1) < stamps(2))
    // exact instants resolve to their own version
    assert(LakeMerge.versionAsOf(spark, dir, stamps(0)) === 0)
    assert(LakeMerge.versionAsOf(spark, dir, stamps(1)) === 1)
    // between two commits → the earlier one; after the last → latest
    assert(LakeMerge.versionAsOf(spark, dir, stamps(2) - 1) <= 1)
    assert(LakeMerge.versionAsOf(spark, dir,
      stamps(2) + 60000) === 2)
    assert(rows(LakeMerge.readAsOf(spark, dir, stamps(1)))
      .contains((1L, "2024-02", "p1-v1")))
    // an instant before the table existed is an error, not empty
    intercept[IllegalArgumentException] {
      LakeMerge.versionAsOf(spark, dir, stamps(0) - 1)
    }
    // the wall-clock change feed: both endpoints resolve through the
    // same as-of rule, so "changes since 02:00" is exactly the
    // version-diff between the resolved snapshots
    val feed = LakeMerge.changesAsOf(spark, dir, stamps(0), stamps(2))
      .select("_change_type", "k", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(feed.toSeq === Seq(("update", 1L, "p1-v2")))
    assert(LakeMerge.changesAsOf(spark, dir, stamps(1), stamps(1))
      .count() === 0, "a zero-width window carries no changes")
    // a vacuumed version is no longer a resolution target: its
    // instant resolves to nothing (data gone), not to a later lie
    LakeMerge.vacuum(spark, dir, keepLast = 1)
    intercept[IllegalArgumentException] {
      LakeMerge.versionAsOf(spark, dir, stamps(0))
    }
    assert(LakeMerge.versionAsOf(spark, dir, stamps(2)) === 2)
  }

  test("manifest checkpoint: a 100+-commit table answers " +
    "latestVersion/history/versionAsOf from the checkpoint + tail — " +
    "O(interval) metadata reads, zero full listings (r12 verdict)") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")            // v0
    (1 to 104).foreach { i =>
      LakeMerge.merge(spark, dir,
        Seq((1L, "2024-02", s"p1-v$i", i.toLong))
          .toDF("k", "dt", "payload", "seq"))
    }
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    assert(f.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_manifest/_checkpoint.json")),
      "periodic commits must have landed a checkpoint")
    // --- latestVersion: pure probe, no manifest opens, no listing
    var opens0 = LakeMerge.metaOpens; var lists0 = LakeMerge.metaListings
    assert(LakeMerge.latestVersion(spark, dir) === 104)
    assert(LakeMerge.metaOpens === opens0,
      "latestVersion must not open any manifest JSON")
    assert(LakeMerge.metaListings === lists0,
      "latestVersion must not list the _manifest dir")
    // --- history: checkpoint summary + tail manifests only. The
    // last checkpoint covers v100, so the tail is v101..v104 — at
    // most interval reads, never the 105 a full replay would cost.
    opens0 = LakeMerge.metaOpens; lists0 = LakeMerge.metaListings
    val h = LakeMerge.history(spark, dir).collect()
    assert(h.length === 105)
    assert(h.map(_.getInt(0)).toSeq === (0 to 104))
    val historyOpens = LakeMerge.metaOpens - opens0
    assert(historyOpens <= LakeMerge.CheckpointInterval,
      s"history read $historyOpens manifests — the checkpoint is not " +
        "being used")
    assert(LakeMerge.metaListings === lists0)
    // --- versionAsOf resolves from the same summaries
    val stamp50 = h(50).getTimestamp(2).getTime
    opens0 = LakeMerge.metaOpens
    assert(LakeMerge.versionAsOf(spark, dir, stamp50) === 50)
    assert(LakeMerge.metaOpens - opens0 <= LakeMerge.CheckpointInterval)
    // --- and the data plane is untouched: a checkpointed old version
    // still time-travels, the tip still reads
    assert(rows(LakeMerge.read(spark, dir, Some(37)))
      .contains((1L, "2024-02", "p1-v37")))
    assert(rows(LakeMerge.read(spark, dir))
      .contains((1L, "2024-02", "p1-v104")))
  }

  test("manifest checkpoint composes with retention: vacuumExpired " +
    "and vacuum(keepLast) re-checkpoint at the tip, history shows " +
    "survivors, the probe never loses the tip") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")            // v0
    (1 to 25).foreach { i =>
      LakeMerge.merge(spark, dir,
        Seq((1L, "2024-02", s"p1-v$i", i.toLong))
          .toDF("k", "dt", "payload", "seq"))
    }
    // expire everything committed before v20's stamp
    val cut = LakeMerge.manifest(spark, dir, Some(20))
      .committedAtMs.get
    val expired = LakeMerge.vacuumExpired(spark, dir, cut)
    assert(expired === (0 until 20))
    assert(LakeMerge.latestVersion(spark, dir) === 25,
      "the tip must survive a post-vacuum checkpoint probe")
    assert(LakeMerge.history(spark, dir).collect().map(_.getInt(0))
      .toSeq === (20 to 25), "history must list exactly the survivors")
    // keepLast on top of expiry — the r11 composability contract,
    // now through the checkpoint path
    LakeMerge.vacuum(spark, dir, keepLast = 3)
    assert(LakeMerge.latestVersion(spark, dir) === 25)
    assert(LakeMerge.history(spark, dir).collect().map(_.getInt(0))
      .toSeq === (23 to 25))
    assert(rows(LakeMerge.read(spark, dir))
      .contains((1L, "2024-02", "p1-v25")))
    // and writes keep working after the re-checkpoints
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-final", 99L)).toDF("k", "dt", "payload", "seq"))
    assert(LakeMerge.latestVersion(spark, dir) === 26)
    assert(rows(LakeMerge.read(spark, dir))
      .contains((1L, "2024-02", "p1-final")))
  }

  test("checkpoint-probe TOCTOU vs concurrent retention: a STALE " +
    "checkpoint naming a vacuumed version falls back to the full " +
    "listing and still resolves the true tip (r13 advice, medium)") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")            // v0
    (1 to 20).foreach { i =>
      LakeMerge.merge(spark, dir,
        Seq((1L, "2024-02", s"p1-v$i", i.toLong))
          .toDF("k", "dt", "payload", "seq"))
    }
    // the writer checkpointed at v20; save those bytes — they are
    // what a reader racing the vacuum below would have in hand
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val ckpt = new org.apache.hadoop.fs.Path(
      s"$dir/_manifest/_checkpoint.json")
    assert(f.exists(ckpt), "interval checkpoint expected at v20")
    val staleBytes = {
      val in = f.open(ckpt)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    // advance the tip past the checkpoint, then expire everything
    // below v23 — v20 (the stale checkpoint's version) is now gone
    (21 to 25).foreach { i =>
      LakeMerge.merge(spark, dir,
        Seq((1L, "2024-02", s"p1-v$i", i.toLong))
          .toDF("k", "dt", "payload", "seq"))
    }
    val cut = LakeMerge.manifest(spark, dir, Some(23)).committedAtMs.get
    LakeMerge.vacuumExpired(spark, dir, cut)
    // the race: the stale pre-vacuum checkpoint lands back in place
    // (equivalently, the reader parsed it just before the rewrite)
    val out = f.create(ckpt, true)
    out.write(staleBytes.getBytes("UTF-8")); out.close()
    // old behavior: probe from 20 finds no v21 manifest (expired) and
    // returns 20 — a vacuumed, unreadable version. Now the resolved
    // tip is validated and the probe falls back to the listing.
    assert(LakeMerge.latestVersion(spark, dir) === 25,
      "stale checkpoint must never resolve to a vacuumed version")
    assert(rows(LakeMerge.read(spark, dir))
      .contains((1L, "2024-02", "p1-v25")))
  }

  test("manifest checkpoint is a CACHE: a torn or deleted checkpoint " +
    "falls back to the full listing with identical answers") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    (1 to 12).foreach { i =>
      LakeMerge.merge(spark, dir,
        Seq((1L, "2024-02", s"p1-v$i", i.toLong))
          .toDF("k", "dt", "payload", "seq"))
    }
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sessionState.newHadoopConf())
    val ckpt = new org.apache.hadoop.fs.Path(
      s"$dir/_manifest/_checkpoint.json")
    val before = LakeMerge.history(spark, dir).collect()
      .map(_.getInt(0)).toSeq
    // torn bytes: parse fails → legacy path
    val out = f.create(ckpt, true)
    out.write("{\"version\": 10, \"entr".getBytes("UTF-8")); out.close()
    assert(LakeMerge.latestVersion(spark, dir) === 12)
    assert(LakeMerge.history(spark, dir).collect()
      .map(_.getInt(0)).toSeq === before)
    // deleted: same
    f.delete(ckpt, false)
    assert(LakeMerge.latestVersion(spark, dir) === 12)
    assert(rows(LakeMerge.read(spark, dir))
      .contains((1L, "2024-02", "p1-v12")))
  }

  test("mergeConditional: clause semantics — matched delete by target " +
    "state, update gated only-if-newer, filtered insert, and a matched " +
    "row satisfying NO clause leaves the target untouched") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // batch: touch keys 0..4 (matched) with seq 5 except key 2 (seq
    // -1: stale), plus new keys 100 (kept by insert clause) and 101
    // (filtered out)
    val batch = Seq(
      (0L, "2024-01", "del-me", 5L),   // matched, delete clause fires
      (1L, "2024-02", "p1-new", 5L),   // matched, newer → update
      (2L, "2024-03", "p2-stale", -1L),// matched, STALE → no clause
      (100L, "2024-01", "ins-even", 5L), // unmatched, k even → insert
      (101L, "2024-01", "ins-odd", 5L))  // unmatched, k odd → dropped
      .toDF("k", "dt", "payload", "seq")
    LakeMerge.mergeConditional(spark, dir, batch,
      whenMatchedDelete = Some("t_payload = 'p0'"),
      whenMatchedUpdate = Some("seq > t_seq"),
      whenNotMatchedInsert = Some("k % 2 = 0"))
    val got = rows(LakeMerge.read(spark, dir))
    assert(!got.exists(_._1 == 0L), "matched delete clause fired")
    assert(got.contains((1L, "2024-02", "p1-new")), "newer update applied")
    assert(got.contains((2L, "2024-03", "p2")),
      "stale batch row must leave the target row untouched")
    assert(got.contains((100L, "2024-01", "ins-even")))
    assert(!got.exists(_._1 == 101L), "insert clause filtered the odd key")
    assert(got.size === 30) // 30 − 1 delete + 1 insert
    // v0 stays exactly readable under the conditional commit
    assert(rows(LakeMerge.read(spark, dir, Some(0))).size === 30)
  }

  test("shallow clone: zero-copy fork of a pinned snapshot; clone and " +
    "parent then evolve independently; compaction self-contains") {
    val src = tempTable()
    LakeMerge.init(spark, src, baseDf, "dt", "k", "seq")          // v0
    LakeMerge.merge(spark, src,                                    // v1
      Seq((1L, "2024-02", "p1-v1", 1L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.merge(spark, src,                                    // v2
      Seq((2L, "2024-03", "p2-v2", 2L)).toDF("k", "dt", "payload", "seq"))
    val dst = tempTable()
    assert(LakeMerge.shallowClone(spark, src, dst, Some(1)) === 0)
    // the clone reads the parent's v1 snapshot exactly...
    assert(rows(LakeMerge.read(spark, dst)) ===
      rows(LakeMerge.read(spark, src, Some(1))))
    // ...with ZERO data bytes copied: no data dir under the clone
    assert(!new java.io.File(s"$dst/data").exists(),
      "a shallow clone must not copy data files")
    // divergence: a merge into the clone is invisible to the parent
    LakeMerge.merge(spark, dst,
      Seq((50L, "2024-01", "clone-only", 3L))
        .toDF("k", "dt", "payload", "seq"))
    assert(rows(LakeMerge.read(spark, dst))
      .contains((50L, "2024-01", "clone-only")))
    assert(!rows(LakeMerge.read(spark, src))
      .contains((50L, "2024-01", "clone-only")))
    // and the parent's later history never leaked in
    assert(!rows(LakeMerge.read(spark, dst))
      .contains((2L, "2024-03", "p2-v2")))
    // compaction rewrites inherited references into LOCAL files:
    // after it, no partition entry points outside the clone
    val state = rows(LakeMerge.read(spark, dst))
    LakeMerge.compact(spark, dst, targetRows = 4096)
    assert(LakeMerge.manifest(spark, dst).partitions
      .forall(!_.dir.startsWith("/")),
      "compaction must self-contain the clone")
    assert(rows(LakeMerge.read(spark, dst)) === state,
      "compaction is pure re-layout")
  }

  test("tags: named refs read their snapshot, pin it against " +
    "vacuumExpired, are create-exclusive, and unpin on delete") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v1", 9L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 10L)).toDF("k", "dt", "payload", "seq"))
    LakeMerge.tag(spark, dir, "baseline", Some(0))
    assert(LakeMerge.tags(spark, dir) === Map("baseline" -> 0))
    assert(rows(LakeMerge.readTag(spark, dir, "baseline"))
      .contains((1L, "2024-02", "p1")), "tag reads the pinned snapshot")
    intercept[java.util.ConcurrentModificationException] {
      LakeMerge.tag(spark, dir, "baseline", Some(1))
    }
    // expiry would drop v0 and v1; the tag pins v0
    val expired = LakeMerge.vacuumExpired(spark, dir,
      System.currentTimeMillis() + 3600000L)
    assert(expired === Seq(1), "only the untagged mid version expires")
    assert(rows(LakeMerge.readTag(spark, dir, "baseline"))
      .contains((1L, "2024-02", "p1")),
      "the tagged snapshot survives retention, data files intact")
    // unpin → the next sweep reclaims it
    assert(LakeMerge.deleteTag(spark, dir, "baseline"))
    assert(LakeMerge.tags(spark, dir).isEmpty)
    assert(LakeMerge.vacuumExpired(spark, dir,
      System.currentTimeMillis() + 3600000L) === Seq(0))
    intercept[RuntimeException] {
      LakeMerge.readTag(spark, dir, "baseline")
    }
    // a tag cannot point at a vacuumed ghost or an invalid name
    intercept[IllegalArgumentException] {
      LakeMerge.tag(spark, dir, "bad name!")
    }
  }

  test("updateWhere: every SET right-hand side evaluates against the " +
    "PRE-update row (SET a=b, b=a swaps); names resolve case-" +
    "insensitively; duplicate assignments are rejected") {
    val dir = tempTable()
    val base = (0 until 6).map(i =>
        (i.toLong, "2024-01", i.toLong * 10, i.toLong * 100, 0L))
      .toDF("k", "dt", "a", "b", "seq")
    LakeMerge.init(spark, dir, base, "dt", "k", "seq")
    // the swap: a sequential withColumn fold would set a=b then b=a
    // where a ALREADY holds b — both ending at the old b
    LakeMerge.updateWhere(spark, dir,
      Seq("a" -> col("b"), "b" -> col("a")), col("k") === 2L)
    val r = LakeMerge.read(spark, dir).filter(col("k") === 2L)
      .select("a", "b").as[(Long, Long)].head()
    assert(r === ((200L, 20L)), "SET a=b, b=a must SWAP")
    // case-insensitive resolution, like SQL itself (and the guards:
    // a case-variant of the key column is still protected)
    LakeMerge.updateWhere(spark, dir,
      Seq("A" -> lit(7L)), col("k") === 3L)
    assert(LakeMerge.read(spark, dir).filter(col("k") === 3L)
      .select("a").as[Long].head() === 7L)
    intercept[IllegalArgumentException] {
      LakeMerge.updateWhere(spark, dir, Seq("K" -> lit(9L)), lit(true))
    }
    intercept[IllegalArgumentException] {
      LakeMerge.updateWhere(spark, dir,
        Seq("a" -> lit(1L), "A" -> lit(2L)), lit(true))
    }
    intercept[IllegalArgumentException] {
      LakeMerge.updateWhere(spark, dir, Seq("nope" -> lit(1L)), lit(true))
    }
  }

  test("mergeInto: the full MERGE clause surface — arm order, star " +
    "forms, NOT MATCHED BY SOURCE, identity preserved on update") {
    val dir = tempTable()
    LakeMerge.init(spark, dir, baseDf, "dt", "k", "seq")
    // k=1: matched, del → first arm (DELETE) claims it before UPDATE
    // k=2: matched, update — source row carries a DIFFERENT dt; the
    //      update must keep the TARGET row's identity (dt unchanged)
    // k=100: not matched, seq>0 → INSERT * (by name; extra source
    //      column `del` is not a table column and is ignored)
    // k=101: not matched, seq<0 → no arm claims it → not inserted
    val src = Seq(
      (1L, "2024-02", "s1", 9L, true),
      (2L, "2024-09", "s2", 9L, false),
      (100L, "2024-01", "s100", 9L, false),
      (101L, "2024-01", "s101", -1L, false))
      .toDF("k", "dt", "payload", "seq", "del")
    val v = LakeMerge.mergeInto(spark, dir, src,
      on = col("_t.k") === col("_s.k"),
      matched = Seq(
        (Some(col("_s.del")), LakeMerge.ArmDelete),
        (None, LakeMerge.ArmUpdate(Seq(
          "payload" -> concat(col("_t.payload"), lit("+"),
            col("_s.payload")),
          "seq" -> col("_s.seq"))))),
      notMatched = Seq(
        (Some(col("_s.seq") > 0), LakeMerge.ArmInsert(Nil))),
      notMatchedBySource = Seq(
        (Some(col("_t.k") === 9L),
          LakeMerge.ArmUpdate(Seq("payload" -> lit("stale"))))))
    assert(v === 1)
    val got = rows(LakeMerge.read(spark, dir))
    assert(!got.exists(_._1 == 1L), "matched DELETE arm removes k=1")
    assert(got.contains((2L, "2024-03", "p2+s2")),
      "matched UPDATE applies assignments but keeps target identity")
    assert(got.contains((100L, "2024-01", "s100")), "INSERT * by name")
    assert(!got.exists(_._1 == 101L), "unclaimed source row not inserted")
    assert(got.contains((9L, "2024-01", "stale")),
      "NOT MATCHED BY SOURCE update")
    assert(got.contains((3L, "2024-01", "p3")), "untouched rows carry")
    assert(got.size === 30, "30 - 1 deleted + 1 inserted")
    // validation: updates cannot move a row's identity; inserts must
    // assign the key; a matched arm cannot INSERT
    intercept[IllegalArgumentException] {
      LakeMerge.mergeInto(spark, dir, src, col("_t.k") === col("_s.k"),
        matched = Seq((None,
          LakeMerge.ArmUpdate(Seq("k" -> lit(0L))))))
    }
    intercept[IllegalArgumentException] {
      LakeMerge.mergeInto(spark, dir, src, col("_t.k") === col("_s.k"),
        notMatched = Seq((None,
          LakeMerge.ArmInsert(Seq("payload" -> lit("x"))))))
    }
    intercept[IllegalArgumentException] {
      LakeMerge.mergeInto(spark, dir, src, col("_t.k") === col("_s.k"),
        matched = Seq((None, LakeMerge.ArmInsert(Nil))))
    }
  }
}
