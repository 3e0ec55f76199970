package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions wiring: a session built with the extensions
  * resolves `cosine_sim` from plain SQL with no register() call, and
  * the result matches the ad-hoc-registered kernel bit-for-bit.
  */
class ExtensionsSpec extends SparkSpec {

  test("withExtensions session resolves cosine_sim from plain SQL") {
    val old = spark // keep the shared session to restore afterwards
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the existing SparkContext; extensions apply because
      // this getOrCreate constructs a genuinely new session
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(ext ne old, "expected a fresh session")
      GraftCatalog.registerAll(ext, sf)
      val rows = ext.sql(
        """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
          |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
          |WHERE a.vec_id < 5 ORDER BY a.vec_id""".stripMargin).collect()
      assert(rows.length === 5)
      // self-similarity of vec 0 with itself is exactly 1.0
      assert(rows(0).getDouble(1) === 1.0)
      assert(rows.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-12))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("withExtensions session resolves the bloom pair from plain SQL") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      GraftCatalog.registerAll(ext, sf)
      // membership prefilter straight from SQL: every probed key that
      // IS in the build side must pass (no false negatives)
      val n = ext.sql(
        """SELECT count(*) AS n FROM documents
          |WHERE graft_bloom_contains(
          |  (SELECT graft_bloom_agg(xxhash64(doc_id), 10000L)
          |   FROM documents),
          |  xxhash64(doc_id))""".stripMargin).head().getLong(0)
      val total = ext.sql("SELECT count(*) FROM documents")
        .head().getLong(0)
      assert(n === total, "bloom must never reject a present key")
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("withExtensions session plans TopK.perKey on the heap operator " +
    "with no enable() call") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.functions.col
      val events = Tables.events(ext, sf)
        .select("user_id", "event_id", "value")
      val df = graft.plans.TopK.perKey(events, Seq(col("user_id")),
        Seq(col("value").desc, col("event_id")), 2)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("PerKeyTopK"),
        s"config-injected rewrite must fire without enable():\n$p")
      assert(!p.contains("Window"), s"WindowExec must be gone:\n$p")
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("GraftCatalog registers every table for the SQL front door") {
    GraftCatalog.registerAll(spark, sf)
    for (t <- GraftCatalog.tableNames)
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) > 0,
        s"table $t missing or empty")
  }

  test("registerLake: latest, time-travel, and meta views from SQL") {
    import spark.implicits._
    import graft.sources.LakeMerge
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lakesql").toString
    val base = (0 until 10)
      .map(i => (i.toLong, s"2024-0${1 + i % 2}", s"p$i", 0L))
      .toDF("k", "dt", "payload", "seq")
    LakeMerge.init(spark, dir, base, "dt", "k", "seq")
    LakeMerge.merge(spark, dir,
      Seq((1L, "2024-02", "p1-v2", 1L)).toDF("k", "dt", "payload", "seq"))
    GraftCatalog.registerLake(spark, "lakes", dir)
    assert(spark.sql("SELECT payload FROM lakes WHERE k = 1")
      .head().getString(0) === "p1-v2")
    assert(spark.sql("SELECT payload FROM lakes_v0 WHERE k = 1")
      .head().getString(0) === "p1")
    assert(spark.sql(
      "SELECT sum(n_rows) FROM lakes_meta").head().getLong(0) === 10L)
    assert(spark.sql("SELECT version FROM lakes_history ORDER BY version")
      .collect().map(_.getInt(0)).toSeq === Seq(0, 1))
    // the CDC feed view replays since CREATION: the overwritten key
    // shows its v0 insert AND the update; an untouched key shows its
    // v0 insert — applying the feed reconstructs the full table
    assert(spark.sql("SELECT _change_type, payload FROM lakes_changes " +
      "WHERE k = 1 ORDER BY _change_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("insert", "p1"), ("update", "p1-v2")))
    assert(spark.sql("SELECT _change_type, payload FROM lakes_changes " +
      "WHERE k = 7").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("insert", "p7")))
    assert(spark.sql("SELECT count(*) FROM lakes_changes " +
      "WHERE _change_type = 'insert'").head().getLong(0) === 10L)
  }

  test("SQL DML: DELETE FROM / UPDATE ... SET over a registered lake " +
    "view compile onto the lake verbs — constraint veto + CDC included") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.LakeMerge
      val dir = java.nio.file.Files
        .createTempDirectory("graft_lakedml").toString
      val base = (0 until 10)
        .map(i => (i.toLong, s"2024-0${1 + i % 2}", s"p$i", i.toLong * 10, 0L))
        .toDF("k", "dt", "payload", "score", "seq")
      LakeMerge.init(ext, dir, base, "dt", "k", "seq")
      LakeMerge.addConstraint(ext, dir, "score_nonneg", "score >= 0")
      GraftCatalog.registerLake(ext, "dml", dir)
      // UPDATE from plain SQL: expression assignments + predicate;
      // returns the committed version, and the view re-registers so
      // the next statement reads the new snapshot
      val v1 = ext.sql("UPDATE dml SET payload = concat(payload, '!'), " +
        "score = score + 5 WHERE k % 2 = 0").head().getInt(0)
      assert(ext.sql("SELECT payload, score FROM dml WHERE k = 2")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("p2!", 25L)))
      assert(ext.sql("SELECT payload FROM dml WHERE k = 3")
        .head().getString(0) === "p3", "non-matching rows untouched")
      // DELETE from plain SQL — the merge-on-read path (deletion
      // vectors, no data-file rewrite)
      val v2 = ext.sql("DELETE FROM dml WHERE score > 60")
        .head().getInt(0)
      assert(v2 === v1 + 1)
      assert(ext.sql("SELECT count(*) FROM dml").head().getLong(0) === 6L,
        "scores 65/70/85/90 must be gone")
      // CDC feed correctness: the SQL verbs are ordinary commits
      assert(ext.sql("SELECT _change_type, payload FROM dml_changes " +
        "WHERE k = 2 ORDER BY _change_type").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq ===
        Seq(("insert", "p2"), ("update", "p2!")))
      assert(ext.sql("SELECT _change_type FROM dml_changes WHERE k = 7")
        .collect().map(_.getString(0)).sorted.toSeq ===
        Seq("delete", "insert"))
      // constraint veto: an UPDATE that violates a CHECK refuses the
      // commit before a byte is written, from SQL exactly as from Scala
      val veto = intercept[Throwable] {
        ext.sql("UPDATE dml SET score = -1 WHERE k = 1")
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
      assert(chain(veto).exists(
        _.isInstanceOf[LakeMerge.ConstraintViolation]),
        s"expected a ConstraintViolation, got $veto")
      assert(ext.sql("SELECT score FROM dml WHERE k = 1")
        .head().getLong(0) === 10L, "vetoed UPDATE must change nothing")
      assert(LakeMerge.latestVersion(ext, dir) === v2,
        "vetoed UPDATE must not commit a version")
      // a name NOT registered as a lake keeps Spark's own DML error
      // surface (the rule must not swallow other tables)
      intercept[Throwable] { ext.sql("DELETE FROM nosuchlake WHERE 1=1") }
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("SQL MERGE INTO over a registered lake view: full clause " +
    "surface, constraint veto + CDC, unregistered names keep Spark's " +
    "error") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.LakeMerge
      val dir = java.nio.file.Files
        .createTempDirectory("graft_lakemerge_sql").toString
      val base = (0 until 10)
        .map(i => (i.toLong, s"2024-0${1 + i % 2}", s"p$i", i.toLong * 10, 0L))
        .toDF("k", "dt", "payload", "score", "seq")
      LakeMerge.init(ext, dir, base, "dt", "k", "seq")
      LakeMerge.addConstraint(ext, dir, "score_nonneg", "score >= 0")
      GraftCatalog.registerLake(ext, "mrg", dir)
      Seq(
        (1L, "2024-02", "s1", 5L, 9L, true),
        (2L, "2024-01", "s2", 7L, 9L, false),
        (100L, "2024-01", "s100", 3L, 9L, false),
        (101L, "2024-01", "s101", 0L, 9L, false))
        .toDF("k", "dt", "payload", "score", "seq", "del")
        .createOrReplaceTempView("upd")
      // the full clause surface from plain SQL: conditional DELETE
      // before UPDATE (arm order), mixed-side assignments, filtered
      // INSERT with explicit columns, NOT MATCHED BY SOURCE
      val v0 = LakeMerge.latestVersion(ext, dir)
      val v1 = ext.sql(
        """MERGE INTO mrg t USING upd s ON t.k = s.k
          |WHEN MATCHED AND s.del THEN DELETE
          |WHEN MATCHED THEN UPDATE SET score = t.score + s.score,
          |  payload = s.payload, seq = s.seq
          |WHEN NOT MATCHED AND s.score > 0 THEN
          |  INSERT (k, dt, payload, score, seq)
          |  VALUES (s.k, s.dt, s.payload, s.score, s.seq)
          |WHEN NOT MATCHED BY SOURCE AND t.k = 9 THEN
          |  UPDATE SET payload = 'stale'
          |""".stripMargin).head().getInt(0)
      assert(v1 === v0 + 1, "MERGE commits exactly one version")
      assert(ext.sql("SELECT count(*) FROM mrg WHERE k = 1")
        .head().getLong(0) === 0L, "matched DELETE arm fires first")
      assert(ext.sql("SELECT payload, score FROM mrg WHERE k = 2")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("s2", 27L)), "matched UPDATE mixes both sides")
      assert(ext.sql("SELECT payload FROM mrg WHERE k = 100")
        .head().getString(0) === "s100", "conditional INSERT fires")
      assert(ext.sql("SELECT count(*) FROM mrg WHERE k = 101")
        .head().getLong(0) === 0L, "filtered INSERT does not fire")
      assert(ext.sql("SELECT payload FROM mrg WHERE k = 9")
        .head().getString(0) === "stale", "NOT MATCHED BY SOURCE")
      assert(ext.sql("SELECT payload FROM mrg WHERE k = 3")
        .head().getString(0) === "p3", "unclaimed rows untouched")
      // CDC: the MERGE is one ordinary commit on the change feed
      assert(ext.sql("SELECT _change_type FROM mrg_changes WHERE k = 100")
        .collect().map(_.getString(0)).toSeq === Seq("insert"))
      // constraint veto: a MERGE whose update violates a CHECK
      // refuses the whole commit
      val veto = intercept[Throwable] {
        ext.sql("MERGE INTO mrg t USING upd s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET score = -1")
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
      assert(chain(veto).exists(
        _.isInstanceOf[LakeMerge.ConstraintViolation]),
        s"expected a ConstraintViolation, got $veto")
      assert(LakeMerge.latestVersion(ext, dir) === v1,
        "vetoed MERGE must not commit a version")
      // UPDATE SET * / INSERT * star forms (assign-by-name)
      Seq((3L, "2024-02", "star3", 1L, 10L),
          (200L, "2024-01", "star200", 2L, 10L))
        .toDF("k", "dt", "payload", "score", "seq")
        .createOrReplaceTempView("upd2")
      val v2 = ext.sql(
        """MERGE INTO mrg USING upd2 ON mrg.k = upd2.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |""".stripMargin).head().getInt(0)
      assert(v2 === v1 + 1)
      assert(ext.sql("SELECT payload, score FROM mrg WHERE k = 3")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("star3", 1L)))
      assert(ext.sql("SELECT payload FROM mrg WHERE k = 200")
        .head().getString(0) === "star200")
      // an unregistered target keeps Spark's own MERGE error surface
      intercept[Throwable] {
        ext.sql("MERGE INTO nosuchlake USING upd s ON nosuchlake.k = s.k " +
          "WHEN MATCHED THEN DELETE")
      }
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("SQL INSERT INTO over a registered lake view: positional and " +
    "column-list appends, key-conflict veto, constraint veto, CDC, " +
    "OVERWRITE rejected, unregistered names keep Spark's error") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.LakeMerge
      val dir = java.nio.file.Files
        .createTempDirectory("graft_lakeinsert").toString
      val base = (0 until 4)
        .map(i => (i.toLong, "2024-01", s"p$i", i.toLong * 10, 0L))
        .toDF("k", "dt", "payload", "score", "seq")
      LakeMerge.init(ext, dir, base, "dt", "k", "seq")
      LakeMerge.addConstraint(ext, dir, "score_nonneg", "score >= 0")
      GraftCatalog.registerLake(ext, "ins", dir)
      // positional VALUES append — full column list, new version,
      // view re-registered to the fresh snapshot
      val v0 = LakeMerge.latestVersion(ext, dir)
      val v1 = ext.sql("INSERT INTO ins VALUES " +
        "(10, '2024-02', 'p10', 100, 1), (11, '2024-01', 'p11', 110, 1)")
        .head().getInt(0)
      assert(v1 === v0 + 1, "INSERT commits exactly one version")
      assert(ext.sql("SELECT count(*) FROM ins").head().getLong(0) === 6L)
      assert(ext.sql("SELECT payload FROM ins WHERE k = 10")
        .head().getString(0) === "p10")
      // column-list form: unlisted columns NULL-fill; INSERT ... SELECT
      ext.sql("INSERT INTO ins (k, dt, score, seq) " +
        "SELECT k + 100, dt, score, seq FROM ins WHERE k >= 10")
      assert(ext.sql("SELECT payload FROM ins WHERE k = 110")
        .head().isNullAt(0), "unlisted column NULL-fills")
      assert(ext.sql("SELECT count(*) FROM ins").head().getLong(0) === 8L)
      // CDC: SQL INSERT is an ordinary commit on the change feed
      assert(ext.sql("SELECT _change_type FROM ins_changes WHERE k = 10")
        .collect().map(_.getString(0)).toSeq === Seq("insert"))
      val vNow = LakeMerge.latestVersion(ext, dir)
      // PK stance: an existing (dt, key) fails the statement LOUDLY
      // and commits nothing
      val clash = intercept[Throwable] {
        ext.sql("INSERT INTO ins VALUES (10, '2024-02', 'x', 1, 2)") }
      assert(clash.getMessage != null &&
        clash.getMessage.contains("already present"), s"got $clash")
      // ... as does a duplicate within the inserted rows themselves
      val dup = intercept[Throwable] {
        ext.sql("INSERT INTO ins VALUES (20, '2024-01', 'a', 1, 1), " +
          "(20, '2024-01', 'b', 2, 1)") }
      assert(dup.getMessage != null &&
        dup.getMessage.contains("duplicate"), s"got $dup")
      // constraint veto before any write, exactly like the Scala path
      val veto = intercept[Throwable] {
        ext.sql("INSERT INTO ins VALUES (21, '2024-01', 'n', -5, 1)") }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
      assert(chain(veto).exists(
        _.isInstanceOf[LakeMerge.ConstraintViolation]),
        s"expected a ConstraintViolation, got $veto")
      assert(LakeMerge.latestVersion(ext, dir) === vNow,
        "failed INSERTs must not commit a version")
      assert(ext.sql("SELECT count(*) FROM ins").head().getLong(0) === 8L)
      // identity columns cannot NULL-fill
      val noKey = intercept[Throwable] {
        ext.sql("INSERT INTO ins (payload, score) VALUES ('q', 1)") }
      assert(chain(noKey).exists(t => t.getMessage != null &&
        t.getMessage.contains("dt/key/order")), s"got $noKey")
      // ... and explicit NULL identity VALUES are vetoed too (r18
      // advice: the columns-present check can't see them, and the
      // null-blind equi-join clash check would let a second NULL-keyed
      // INSERT silently collapse into the first via resolve())
      val nullKey = intercept[Throwable] {
        ext.sql("INSERT INTO ins VALUES (40, NULL, 'q', 1, 1)") }
      assert(chain(nullKey).exists(t => t.getMessage != null &&
        t.getMessage.contains("NULL in one of the identity")),
        s"got $nullKey")
      val nullOrd = intercept[Throwable] {
        ext.sql("INSERT INTO ins VALUES (41, '2024-03', 'q', 1, NULL)") }
      assert(chain(nullOrd).exists(t => t.getMessage != null &&
        t.getMessage.contains("NULL in one of the identity")),
        s"got $nullOrd")
      assert(ext.sql("SELECT count(*) FROM ins").head().getLong(0) === 8L,
        "NULL-identity INSERTs must not write rows")
      // INSERT OVERWRITE is rejected explicitly, not silently appended
      val ovw = intercept[Throwable] {
        ext.sql("INSERT OVERWRITE ins VALUES (30, '2024-01', 'o', 1, 1)") }
      assert(chain(ovw).exists(t => t.getMessage != null &&
        t.getMessage.contains("INSERT OVERWRITE")), s"got $ovw")
      // a name NOT registered as a lake keeps Spark's own error
      intercept[Throwable] {
        ext.sql("INSERT INTO nosuchlake VALUES (1)") }
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("SQL DML subquery conditions re-resolve at run time: an IN " +
    "subquery over the SAME lake view reads the freshest snapshot, " +
    "and a correlated EXISTS resolves its outer references") {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.LakeMerge
      val dir = java.nio.file.Files
        .createTempDirectory("graft_lakedml_subq").toString
      val base = (0 until 8)
        .map(i => (i.toLong, "2024-01", i.toLong, 0L))
        .toDF("k", "dt", "b", "seq")
      LakeMerge.init(ext, dir, base, "dt", "k", "seq")
      GraftCatalog.registerLake(ext, "swp", dir)
      // mutate AFTER registration so a registration-time frozen
      // subquery plan would see the OLD b values and delete nothing
      ext.sql("UPDATE swp SET b = b + 100 WHERE k < 3")
      ext.sql("DELETE FROM swp WHERE k IN (SELECT k FROM swp " +
        "WHERE b >= 100)")
      assert(ext.sql("SELECT count(*) FROM swp").head().getLong(0) === 5L,
        "the IN subquery must see the post-UPDATE snapshot")
      assert(ext.sql("SELECT min(k) FROM swp").head().getLong(0) === 3L)
      // correlated EXISTS with target-qualified outer references: the
      // snapshot is aliased with the view name at run time
      Seq(4L, 6L).toDF("k").createOrReplaceTempView("hits")
      ext.sql("DELETE FROM swp WHERE EXISTS " +
        "(SELECT 1 FROM hits h WHERE h.k = swp.k)")
      assert(ext.sql("SELECT k FROM swp ORDER BY k").collect()
        .map(_.getLong(0)).toSeq === Seq(3L, 5L, 7L))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("registerArtifacts: the standing curation artifacts answer " +
    "plain SQL, identical to the operator handles") {
    GraftCatalog.registerArtifacts(spark, sf)
    for (v <- Seq("artifact_cluster_map", "artifact_band_index",
        "artifact_gram_index", "artifact_fp_index",
        "artifact_ann_cells", "artifact_report_edges"))
      assert(spark.sql(s"SELECT count(*) FROM $v").head().getLong(0) > 0,
        s"$v must be non-empty")
    val viaSql = spark.sql(
      "SELECT doc_id, cluster_id FROM artifact_cluster_map ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = SparkEntry.queries("d_dup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === direct,
      "the SQL view and the operator query must serve the same artifact")
  }
}
