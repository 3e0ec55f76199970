package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-resident persistence for the engine's standing artifacts —
  * the build-once relations and trained models the scaladocs across
  * Dedup/Similarity/TextAnalysis all describe as "a lake table in
  * production": the dup-cluster map, the LSH band index and its gram
  * verify relation, the winnowed fingerprint index, the quantizer
  * cells, the IVF/k-means/SQ8 codebooks, the BPE merge table.
  *
  * Until round 12 those artifacts were session-lifetime
  * `localCheckpoint` handles — fast, but explicitly NOT
  * fault-tolerant (one lost executor kills the handle mid-session and
  * every consumer after it fails) and gone at session end, so every
  * new session re-paid the build. This store closes both gaps by
  * dogfooding the engine's own lakehouse ([[LakeMerge]]): a build is
  * an explicit, atomic lake commit; a read is a plain parquet-backed
  * scan that survives executor loss like any other table; a FRESH
  * session (or a second driver process on the same storage) reads the
  * artifact with zero rebuild.
  *
  * Addressing & staleness — the table path IS the cache key:
  * `root/<family>/<fingerprint>`, where the fingerprint hashes
  * (a) the corpus directory path and the (relative path, length,
  * mtime) of every file under it — new/changed corpus data can never
  * serve a stale artifact — and (b) a code fingerprint of the
  * engine's own compiled classes/jar, so a REBUILT engine (new
  * algorithm, new constants) never trusts an artifact trained by old
  * code. Stale fingerprints simply stop being addressed; they are
  * plain directories under the root, reclaimed by deleting the root
  * (a deployment would age them out like any cache volume).
  *
  * Storage shape: the artifact relation is wrapped with a synthetic
  * 128-bit row key (`_akey` = md5 of the row's JSON) and a 16-way
  * bucket partition (`_adt` = first hex nibble of the key) so writes
  * and reads parallelize instead of funneling through one task, then
  * committed via [[LakeMerge.init]]. Artifact relations are treated
  * as SETS: byte-identical duplicate rows collapse under the (dt,
  * key) dedup — every artifact in the engine is a distinct-row index
  * or model, so this is a no-op in practice. Builds are deterministic
  * (oracle-gated), so two sessions racing to persist the same
  * fingerprint write identical content and the create-exclusive
  * manifest commit picks a winner harmlessly.
  *
  * Root resolution: `SPARK_GRAFT_ARTIFACT_DIR` (a production
  * deployment points this at durable shared storage, e.g. the bucket
  * next to the corpus); default is a per-machine tmp root so local
  * sessions get cross-session reuse out of the box; the literal value
  * `off` disables persistence entirely (artifacts fall back to the
  * round-11 eager localCheckpoint stance). Specs redirect via
  * [[rootOverride]].
  */
object ArtifactStore {

  /** Spec/driver hook: redirect (Some(dir)), disable (Some("off")),
    * or restore env resolution (None).
    */
  @volatile var rootOverride: Option[String] = None

  private def configuredRoot: String =
    rootOverride.getOrElse(graft.Settings.artifactRoot)

  def enabled: Boolean = {
    val r = configuredRoot
    r.nonEmpty && r != "off"
  }

  // ------------------------------------------------------------------
  // Fingerprints
  // ------------------------------------------------------------------

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Fingerprint of the engine's own compiled code — CONTENT-based:
    * every .class entry's (name, size, CRC32) in sorted order, read
    * from the jar the class loaded from (zip entry CRCs are of the
    * uncompressed bytes, so they survive repackaging — sbt's runMain
    * assembles a FRESH temp jar per invocation, and a path/mtime
    * fingerprint would retire every artifact on every run) or walked
    * from an sbt classes directory. Any real recompile changes some
    * class's bytes and with them the digest, so an artifact trained
    * by OLD code is never served to new code — the guard that makes
    * cross-session reuse safe across engine versions. Computed once
    * per JVM.
    */
  private lazy val codeFingerprint: String = {
    val src = getClass.getProtectionDomain.getCodeSource
    val loc = if (src == null) null else src.getLocation
    if (loc == null) "nocode"
    else {
      val f = new java.io.File(loc.toURI)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      if (f.isFile) {
        val zf = new java.util.zip.ZipFile(f)
        try {
          val en = zf.entries()
          while (en.hasMoreElements) {
            val e = en.nextElement()
            if (e.getName.endsWith(".class"))
              entries += s"${e.getName}:${e.getSize}:${e.getCrc}"
          }
        } finally zf.close()
      } else {
        def walk(d: java.io.File, rel: String): Unit = {
          val fs = d.listFiles()
          if (fs != null) fs.foreach { c =>
            if (c.isDirectory) walk(c, s"$rel${c.getName}/")
            else if (c.getName.endsWith(".class")) {
              val crc = new java.util.zip.CRC32
              crc.update(java.nio.file.Files.readAllBytes(c.toPath))
              entries += s"$rel${c.getName}:${c.length}:${crc.getValue}"
            }
          }
        }
        walk(f, "")
      }
      md5hex(entries.sorted.mkString("|"))
    }
  }

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Fingerprint of the corpus: every file's (relative path, length,
    * mtime) under `corpusDir`, recursively, sorted. One driver-side
    * listing per (JVM, corpus) — cached because artifact lookups are
    * hot and corpora in this engine are immutable snapshots.
    */
  private val corpusFps =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def corpusFingerprint(spark: SparkSession,
      corpusDir: String): String =
    corpusFps.getOrElseUpdate(corpusDir, {
      val f = fs(spark, corpusDir)
      val root = new Path(corpusDir)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(p: Path): Unit =
        f.listStatus(p).sortBy(_.getPath.getName).foreach { st =>
          if (st.isDirectory) walk(st.getPath)
          else buf += s"${st.getPath.toString.stripPrefix(root.toString)}:" +
            s"${st.getLen}:${st.getModificationTime}"
        }
      if (f.exists(root)) walk(root)
      md5hex(corpusDir + "|" + buf.mkString("|"))
    })

  /** The lake table directory addressing (family, corpus, code). */
  private[graft] def tableDir(spark: SparkSession, family: String,
      corpusDir: String): String =
    s"$configuredRoot/$family/" +
      md5hex(corpusFingerprint(spark, corpusDir) + "|" + codeFingerprint)
        .take(16)

  // ------------------------------------------------------------------
  // Load / save counters (spec + telemetry hooks)
  // ------------------------------------------------------------------

  private val loadCounts =
    scala.collection.concurrent.TrieMap.empty[String, Int]
  private val saveCounts =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Times this JVM served `family` from the lake with zero rebuild. */
  def loads(family: String): Int = loadCounts.getOrElse(family, 0)

  /** Times this JVM built `family` and committed it to the lake. */
  def saves(family: String): Int = saveCounts.getOrElse(family, 0)

  private def bump(m: scala.collection.concurrent.TrieMap[String, Int],
      k: String): Unit =
    m.updateWith(k) { v => Some(v.getOrElse(0) + 1) }

  // ------------------------------------------------------------------
  // Materialization
  // ------------------------------------------------------------------

  private val MetaCols = Seq("_adt", "_akey", "_aseq")

  private def wrap(df: DataFrame): DataFrame = {
    val key = md5(to_json(struct(df.columns.map(col): _*)))
    df.withColumn("_akey", key)
      .withColumn("_adt", substring(col("_akey"), 1, 1))
      .withColumn("_aseq", lit(0L))
  }

  private def unwrap(df: DataFrame): DataFrame =
    df.drop(MetaCols: _*)

  private def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(s"$dir/_manifest/v0.json"))

  /** Create the artifact root before the first persist. When the
    * root is the tmpdir DEFAULT (env unset, no spec override) it is
    * pinned owner-only: java.io.tmpdir is world-writable shared
    * space, and a group/world-readable cache there both collides
    * across users and lets another user pre-plant content at a
    * fingerprint address (addresses identify content, they don't
    * authenticate it). Explicitly-configured roots keep whatever
    * permissions the deployment chose.
    */
  private def ensureRoot(s: SparkSession): Unit = {
    val rootDir = configuredRoot
    val f = fs(s, rootDir)
    val p = new Path(rootDir)
    if (!f.exists(p)) {
      f.mkdirs(p)
      if (rootOverride.isEmpty && graft.Settings.artifactRootIsDefault)
        try f.setPermission(p,
          new org.apache.hadoop.fs.permission.FsPermission("700"))
        catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** True ONLY for the corruption signatures quarantine exists for:
    * the v0 manifest is unparseable, or a data file v0 references is
    * gone (a partial external vacuum, a torn copy). Everything else a
    * load can throw — permission blip, transient FS error, concurrent
    * maintenance mid-listing — returns false: a committed SHARED
    * table other live sessions are reading must never be destroyed
    * over a failure that may not be the table's fault.
    */
  private def isCorrupt(s: SparkSession, dir: String): Boolean =
    try {
      val m = LakeMerge.manifest(s, dir, Some(0))
      val f = fs(s, dir)
      m.partitions.exists { e =>
        val base =
          if (e.dir.startsWith("/")) e.dir else s"$dir/${e.dir}"
        e.files.exists(fn =>
          !f.exists(new Path(s"$base/${m.dtCol}=${e.dt}/$fn")))
      }
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => true
      case _: org.json4s.MappingException => true
      // bytes contradict their checksum — definitive torn content,
      // not a blip (Hadoop checksummed FS surfaces manifest
      // corruption this way before JSON parsing ever sees it)
      case _: org.apache.hadoop.fs.ChecksumException => true
      case scala.util.control.NonFatal(_) => false // transient: keep it
    }

  /** Quarantine a CORRUPT committed dir by renaming it aside
    * (tombstone), never recursive-delete: a rename leaves a
    * concurrent builder's in-flight data files intact under the
    * tombstoned name instead of deleting them mid-write, keeps the
    * bytes for post-mortem, and the tombstone (still a committed
    * single-snapshot table under the family dir) ages out through the
    * normal [[vacuum]] retention by its own v0 commit stamp.
    * Best-effort (an unwritable root just leaves the throw to the
    * rebuild fallback).
    */
  private def quarantine(s: SparkSession, dir: String): Unit =
    try {
      val f = fs(s, dir)
      val dst = new Path(dir + ".tombstone-" + System.currentTimeMillis)
      if (!f.rename(new Path(dir), dst)) () // racing quarantine won
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Load-failure policy: quarantine only a VERIFIED-corrupt dir
    * (tombstoned aside), then RE-VERIFY the address — a racing
    * session may have tombstoned and rebuilt it already, in which
    * case the fresh v0 is read instead of built a second time. A
    * transient failure leaves the table untouched and falls through
    * to the build path, whose create-exclusive commit turns into a
    * plain re-read via the ConcurrentModificationException branch.
    */
  private def recoverLoad[T](s: SparkSession, dir: String)(
      retry: => T): Option[T] =
    if (!isCorrupt(s, dir)) None
    else {
      quarantine(s, dir)
      if (exists(s, dir))
        try Some(retry)
        catch { case scala.util.control.NonFatal(_) => None }
      else None
    }

  /** Lake-else-build-and-commit for a DataFrame artifact. The
    * returned relation is parquet-backed (fault-tolerant, shared
    * across sessions); with persistence disabled it degrades to the
    * eager localCheckpoint handle. An EMPTY build result persists
    * like any other (zero-partition snapshots read back as an empty
    * relation with the recorded schema); a committed table that
    * fails to READ is quarantined and rebuilt instead of crashing
    * every session that addresses the fingerprint.
    */
  def materialize(s: SparkSession, family: String, corpusDir: String)(
      build: => DataFrame): DataFrame = {
    if (!enabled) return build.localCheckpoint(true)
    val dir = tableDir(s, family, corpusDir)
    def loadIt(): DataFrame = unwrap(LakeMerge.read(s, dir))
    val loaded: Option[DataFrame] =
      if (!exists(s, dir)) None
      else {
        val t0 = System.nanoTime()
        try {
          val out = loadIt()
          bump(loadCounts, family)
          graft.Artifacts.record(family, corpusDir,
            (System.nanoTime() - t0) / 1000000, "lake_load")
          Some(out)
        } catch {
          case scala.util.control.NonFatal(_) =>
            recoverLoad(s, dir) {
              val out = loadIt(); bump(loadCounts, family); out
            }
        }
      }
    loaded.getOrElse {
      val t0 = System.nanoTime()
      val built = graft.Artifacts.nestedScope(family, corpusDir)(build)
      try {
        ensureRoot(s)
        LakeMerge.init(s, dir, wrap(built), "_adt", "_akey", "_aseq")
        bump(saveCounts, family)
        val out = loadIt()
        graft.Artifacts.record(family, corpusDir,
          (System.nanoTime() - t0) / 1000000, "build_persist")
        out
      } catch {
        // another session committed v0 first: read the winner
        case _: java.util.ConcurrentModificationException =>
          bump(loadCounts, family)
          loadIt()
        // unwritable root: stay session-local for this run
        case scala.util.control.NonFatal(_) =>
          graft.Artifacts.record(family, corpusDir,
            (System.nanoTime() - t0) / 1000000, "build")
          built.localCheckpoint(true)
      }
    }
  }

  /** Lake-else-build for a whole TABLE-DIRECTORY artifact (r15
    * verdict #8) — the L-family demo tables (merged / conditional /
    * MOR / restored) whose artifact is not one relation but a lake
    * dir with a specific VERSION HISTORY the consumers pin into
    * (`read(..., Some(1))`, change feeds, meta stats). `build` gets a
    * fresh path and must leave a committed table there; the content
    * address (corpus + code fingerprint) guarantees any code change
    * re-builds, so a cold JVM on an unchanged build serves the
    * standing directory for the cost of a manifest probe — the same
    * warmup stance the dedup/ANN artifacts have, applied to the four
    * 3.8-4.7 s cold-bench builds.
    *
    * Concurrency: the build lands in a sibling `.build-*` dir and ONE
    * rename claims the address — the loser deletes its own bytes and
    * serves the winner's (rename-into-existing fails on every
    * relevant FS). A verified-corrupt standing dir is tombstoned
    * aside (the [[quarantine]] policy) and rebuilt.
    */
  def materializeDir(s: SparkSession, family: String,
      corpusDir: String)(build: String => Unit): String = {
    def tmpBuild(): String = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_${family.replace('.', '_')}")
        .toString
      graft.Artifacts.nestedScope(family, corpusDir)(build(tmp))
      tmp
    }
    if (!enabled) return tmpBuild()
    val dir = tableDir(s, family, corpusDir)
    val f = fs(s, dir)
    def serveStanding(): Option[String] =
      if (!exists(s, dir)) None
      else if (!isCorrupt(s, dir)) {
        bump(loadCounts, family)
        graft.Artifacts.record(family, corpusDir, 0, "lake_load")
        Some(dir)
      } else { quarantine(s, dir); None }
    serveStanding().getOrElse {
      val t0 = System.nanoTime()
      // The fallback catch is scoped to ROOT/RENAME failures only: a
      // failure inside build() itself propagates (silently re-running
      // an expensive broken build would just fail twice, slower).
      val rootOk =
        try { ensureRoot(s); true }
        catch { case scala.util.control.NonFatal(_) => false }
      if (!rootOk) {
        // unwritable root: stay session-local for this run
        val tmp = tmpBuild()
        graft.Artifacts.record(family, corpusDir,
          (System.nanoTime() - t0) / 1000000, "build")
        tmp
      } else {
        val tmp = dir + ".build-" +
          java.util.UUID.randomUUID().toString.take(8)
        var claimed = false
        try {
          // propagates — never silently rebuilt
          graft.Artifacts.nestedScope(family, corpusDir)(build(tmp))
          // Claim by rename. On HDFS-like filesystems rename(src,
          // existingDst) moves src INTO dst and returns true, so an
          // existing dst is a lost race BEFORE renaming; after a true
          // rename, the claim must show a readable v0 manifest at the
          // address AND no nested build tree (the into-existing
          // signature) before it counts as ours.
          val nested = new Path(dir, new Path(tmp).getName)
          claimed =
            try {
              !f.exists(new Path(dir)) &&
                f.rename(new Path(tmp), new Path(dir)) && {
                  if (f.exists(nested)) { f.delete(nested, true); false }
                  else exists(s, dir)
                }
            } catch { case scala.util.control.NonFatal(_) => false }
          if (claimed) {
            bump(saveCounts, family)
            graft.Artifacts.record(family, corpusDir,
              (System.nanoTime() - t0) / 1000000, "build_persist")
          } else {
            // a racing session claimed the address: serve the winner
            bump(loadCounts, family)
          }
          dir
        } finally {
          // rename never happened (or nested): never leave a partial
          // .build-* under the family root
          if (!claimed) {
            try f.delete(new Path(tmp), true)
            catch { case scala.util.control.NonFatal(_) => () }
          }
        }
      }
    }
  }

  /** Retention for the artifact root: every engine recompile and
    * every corpus change re-addresses its artifacts under a fresh
    * fingerprint, stranding the old dirs — this is the cleanup a
    * deployment cron runs. An artifact table's age is its OWN lake
    * commit stamp (v0's `committedAtMs` — artifact tables are
    * single-commit); anything older than the cutoff is deleted,
    * whole table dirs at a time. Unparseable dirs (a torn
    * half-written build that never committed) are deleted too — with
    * no v0 manifest nothing can ever read them — but only once their
    * directory mtime is past the cutoff: data files land BEFORE the
    * manifest commit, so an unconditional delete would race an
    * in-flight build in another session and strip its persist out
    * from under the init. Returns the deleted dirs. Safe to run
    * concurrently with readers of LIVE fingerprints (current code +
    * corpus always re-derives a current address, and a current build
    * is never older than the cutoff a retention policy uses).
    */
  def vacuum(spark: SparkSession, olderThanMs: Long): Seq[String] = {
    val rootDir = configuredRoot
    if (!enabled) return Nil
    val f = fs(spark, rootDir)
    val root = new Path(rootDir)
    if (!f.exists(root)) return Nil
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    f.listStatus(root).filter(_.isDirectory).foreach { fam =>
      f.listStatus(fam.getPath).filter(_.isDirectory).foreach { fp =>
        val dir = fp.getPath.toString
        val stamp =
          try {
            if (!f.exists(new Path(s"$dir/_manifest/v0.json"))) None
            else LakeMerge.manifest(spark, dir, Some(0)).committedAtMs
          } catch { case scala.util.control.NonFatal(_) => None }
        // stamped dirs expire by their commit stamp; unstamped/torn
        // dirs by directory mtime (an in-flight build lands data
        // before its manifest — never delete a fresh uncommitted dir)
        if (stamp.getOrElse(fp.getModificationTime) < olderThanMs) {
          f.delete(fp.getPath, true)
          deleted += dir
        }
      }
    }
    deleted.toSeq
  }

  /** Lake-else-build-and-commit for a DRIVER-SIDE artifact (codebook
    * arrays, bound pairs, merge tables): the value round-trips
    * through a small DataFrame, so a fresh session re-collects the
    * trained model instead of re-training it.
    */
  def materializeValue[V](s: SparkSession, family: String,
      corpusDir: String)(build: => V)(
      toDf: V => DataFrame)(fromDf: DataFrame => V): V = {
    if (!enabled) return build
    val dir = tableDir(s, family, corpusDir)
    val loaded: Option[V] =
      if (!exists(s, dir)) None
      else {
        val t0 = System.nanoTime()
        try {
          val out = fromDf(unwrap(LakeMerge.read(s, dir)))
          bump(loadCounts, family)
          graft.Artifacts.record(family, corpusDir,
            (System.nanoTime() - t0) / 1000000, "lake_load")
          Some(out)
        } catch {
          case scala.util.control.NonFatal(_) =>
            recoverLoad(s, dir) {
              val out = fromDf(unwrap(LakeMerge.read(s, dir)))
              bump(loadCounts, family); out
            }
        }
      }
    loaded.getOrElse {
      val t0 = System.nanoTime()
      val built = graft.Artifacts.nestedScope(family, corpusDir)(build)
      try {
        ensureRoot(s)
        LakeMerge.init(s, dir, wrap(toDf(built)), "_adt", "_akey", "_aseq")
        bump(saveCounts, family)
        graft.Artifacts.record(family, corpusDir,
          (System.nanoTime() - t0) / 1000000, "build_persist")
      } catch {
        case _: java.util.ConcurrentModificationException => ()
        case scala.util.control.NonFatal(_) =>
          graft.Artifacts.record(family, corpusDir,
            (System.nanoTime() - t0) / 1000000, "build")
      }
      built
    }
  }
}
