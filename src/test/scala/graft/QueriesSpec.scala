package graft

import org.apache.spark.sql.functions._

/** Every registered query runs and returns rows on sf0.001; a few
  * semantics are pinned exactly. The full value-level gate is the
  * DuckDB oracle compare (tools/parity.py / driver CORRECTNESS).
  */
class QueriesSpec extends SparkSpec {

  test("every registered query has an oracle or a documented reason") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: ${noOracle.mkString(", ")}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("r_clamp_gear: no gear id above SMALLINT max survives") {
    val over = SparkEntry.queries("r_clamp_gear")(spark, sf)
      .filter(col("gear_id") > 32767).count()
    assert(over === 0)
  }

  test("r_ts_normalize: all normalized ts within the reference gate") {
    val bad = SparkEntry.queries("r_ts_normalize")(spark, sf)
      .filter(col("ts_sec") < 1577883600L || col("ts_sec") > 1735736400L)
      .count()
    assert(bad === 0)
  }

  test("ms→s normalization carries fractional milliseconds (ref " +
    "main.py:128-129 keeps them): 1700000000123 lands at .123000") {
    import spark.implicits._
    val got = Seq(1700000000123L, 1700000000L).toDF("raw")
      .select(
        graft.operators.Cleanse.normalizeEpoch(col("raw")).as("sec"),
        graft.operators.Cleanse.normalizeEpochMicros(col("raw")).as("us"),
        date_format(
          timestamp_micros(
            graft.operators.Cleanse.normalizeEpochMicros(col("raw"))),
          "SSS").as("millis"))
      .as[(Long, Long, String)].collect()
    // ms-stamped: the whole-second view floors, the micros view keeps
    // the reference's fractional part exactly
    assert(got(0) === ((1700000000L, 1700000000123000L, "123")))
    // s-stamped: both views agree at .000
    assert(got(1) === ((1700000000L, 1700000000000000L, "000")))
  }

  test("r_sanitize_name matches the reference sanitizer") {
    import spark.implicits._
    val got = Seq("  Player_One-Two  ").toDF("c_name")
      .select(graft.operators.Cleanse.sanitizeName(col("c_name")))
      .as[String].head()
    assert(got === "player one two")
  }

  test("r_fact_assemble: every fact row resolves all three dims") {
    val f = SparkEntry.queries("r_fact_assemble")(spark, sf)
    assert(f.filter(col("sighting_id").isNull || col("location_id").isNull
      || col("gear_id").isNull).count() === 0)
    // re-keying loses no rows
    assert(f.count() === Tables.events(spark, sf).count())
  }

  test("r_resolve_v1: every v1 message resolves, new names get new ids") {
    val r = SparkEntry.queries("r_resolve_v1")(spark, sf)
    // resolution loses no resolvable message (null-k rows are the
    // reference's ReportedDoesNotExist dead letters) and never
    // leaves a null id
    val resolvable = Tables.events(spark, sf)
      .filter(get_json_object(col("props"), "$.k").isNotNull).count()
    assert(r.count() === resolvable)
    assert(r.filter(col("reporting_id").isNull ||
      col("reported_id").isNull).count() === 0)
    // reported names derive from k*31 > max custkey for some rows →
    // the insert path must have been taken (ids beyond the dim's max)
    val maxExisting = Tables.customer(spark, sf)
      .agg(max("c_custkey")).head().getLong(0)
    assert(r.filter(col("reported_id") > maxExisting).count() > 0,
      "get-or-insert never took the insert path")
    assert(r.filter(col("reporting_id") > maxExisting).count() === 0,
      "reporter names are all existing players")
  }

  test("r_fact_full: 9-col gear dedup is collision-free and lossless") {
    val f = SparkEntry.queries("r_fact_full")(spark, sf)
    assert(f.count() === Tables.events(spark, sf).count())
    val dim = SparkEntry.queries("r_dim_gear9")(spark, sf)
    // hash surrogate ids: one id per distinct 9-slot tuple
    assert(dim.select("gear_id").distinct().count() === dim.count())
    // every fact gear_id exists in the dim
    assert(f.join(dim.select("gear_id"), Seq("gear_id"), "left_anti")
      .count() === 0)
  }

  test("q_salted_agg equals the direct (unsalted) aggregation") {
    val salted = SparkEntry.queries("q_salted_agg")(spark, sf)
    val direct = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(12,2)")) * 100).cast("long")
          .as("sum_value"),
        min("event_id").as("first_event"), max("event_id").as("last_event"))
    assert(salted.except(direct).count() === 0)
    assert(direct.except(salted).count() === 0)
  }

  test("s_ann_multiprobe: strict superset of the single-probe bucket") {
    val single = SparkEntry.queries("s_ann_lsh")(spark, sf)
      .select("vec_id", "score_micro")
    val multi = SparkEntry.queries("s_ann_multiprobe")(spark, sf)
      .select("vec_id", "score_micro")
    // sound superset properties (a worst-score compare would be
    // unsound when the probe's own bucket holds < 10 candidates):
    // the Hamming-1 candidate set contains the Hamming-0 set, so the
    // best score can only improve and the row count can only grow
    val best = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(max("score_micro")).head().getLong(0)
    assert(best(multi) >= best(single),
      "multiprobe top score must not be below single-probe's")
    assert(multi.count() >= single.count())
    assert(multi.count() <= 10)
  }

  test("t_source_mix partitions the corpus exactly") {
    val mix = SparkEntry.queries("t_source_mix")(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(mix.agg(sum("n_docs")).head().getLong(0) === docs.count())
    assert(mix.agg(sum("total_chars")).head().getLong(0) ===
      docs.agg(sum(length(col("text")))).head().getLong(0))
  }

  test("t_sample_strat: deterministic ~1/8 hash sample") {
    val docs = Tables.documents(spark, sf).count().toDouble
    val a = SparkEntry.queries("t_sample_strat")(spark, sf)
    val b = SparkEntry.queries("t_sample_strat")(spark, sf)
    assert(a.collect().toSeq === b.collect().toSeq, "must be deterministic")
    val rate = a.count() / docs
    assert(rate > 0.04 && rate < 0.22, s"rate $rate far from 2/16")
  }

  test("t_vocab is ordered by count desc and t_len_quantiles is sane") {
    val v = SparkEntry.queries("t_vocab")(spark, sf).collect()
    assert(v.length <= 20)
    assert(v.sliding(2).forall(p => p.length < 2 ||
      p(0).getAs[Long]("n") >= p(1).getAs[Long]("n")))
    val q = SparkEntry.queries("t_len_quantiles")(spark, sf)
    assert(q.filter(col("p50") > col("p90") ||
      col("p90") > col("max_chars")).count() === 0)
  }

  test("t_len_quantiles approx twin tracks the exact form, no sort-agg") {
    val exact = SparkEntry.queries("t_len_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val approx = graft.operators.TextAnalysis
      .lenQuantilesApprox(spark, sf).collect()
    assert(approx.length === exact.size)
    for (r <- approx) {
      val (p50, p90) = exact(r.getString(0))
      // accuracy 10000 ⇒ rank error ≤ 1e-4, but the VALUE can differ
      // by one inter-sample gap: the exact form linearly interpolates
      // between ranks while the sketch returns a real sample, and on
      // the small per-source test groups neighboring lengths sit ~10
      // chars apart — 5% covers that granularity, far below any
      // distribution-shift a corpus report cares about
      assert(math.abs(r.getLong(1) - p50) <= math.max(2L, p50 / 20),
        s"p50 for ${r.getString(0)}: ${r.getLong(1)} vs exact $p50")
      assert(math.abs(r.getLong(2) - p90) <= math.max(2L, p90 / 20),
        s"p90 for ${r.getString(0)}: ${r.getLong(2)} vs exact $p90")
    }
    val plan = graft.operators.TextAnalysis.lenQuantilesApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile") || plan.contains("ApproximatePercentile"),
      "scale path must aggregate a sketch, not sort groups")
  }

  test("w_ntile approx twin: cut-point quartiles track exact ntile " +
    "with no window anywhere") {
    val exact = SparkEntry.queries("w_ntile")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.operators.Analytics.ntileApprox(spark, sf)
    val rows = approx.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === exact.size, "same user set")
    for ((uid, spend, _) <- rows)
      assert(spend === exact(uid)._1, s"spend for $uid must be exact")
    // value-cut quartiles == rank quartiles except at cut-point ties:
    // each of the 3 boundaries can reassign at most the tied users
    // around it, and never by more than one bucket
    val diffs = rows.filter { case (uid, _, q) => q != exact(uid)._2 }
    assert(diffs.forall { case (uid, _, q) =>
      math.abs(q - exact(uid)._2) <= 1 },
      s"a boundary user may move one bucket at most: $diffs")
    assert(diffs.length <= 6,
      s"only boundary-tied users may differ: ${diffs.length}")
    // monotone: more spend can never mean a WORSE (higher) quartile
    val sorted = rows.sortBy(-_._2)
    sorted.sliding(2).foreach {
      case Array((_, sa, qa), (_, sb, qb)) =>
        if (sa > sb) assert(qa <= qb, s"monotonicity: $sa->$qa vs $sb->$qb")
      case _ =>
    }
    // THE scale claim: no window, no global sort below the
    // presentation orderBy — the ranking became a broadcast-free
    // comparison fold over trained literals
    val p = approx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Window"), s"no WindowExec may survive:\n$p")
  }

  test("q_table_stats approx twin: one-scan HLL plan, exact everywhere " +
    "but NDV, NDV inside the sketch band") {
    val exact = SparkEntry.queries("q_table_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = graft.operators.Analytics.tableStatsApprox(spark, sf)
    val rows = approx.collect()
    assert(rows.length === exact.size)
    for (r <- rows; e = exact(r.getString(0))) {
      assert(r.getLong(1) === e.getLong(1), "n_rows must be exact")
      assert(r.getLong(2) === e.getLong(2), "n_nonnull must be exact")
      assert(r.getString(4) === e.getString(4), "min must be exact")
      assert(r.getString(5) === e.getString(5), "max must be exact")
      val (got, want) = (r.getLong(3), e.getLong(3))
      // 2% rsd HLL++: allow 3 sigma plus integer slack on tiny NDVs
      assert(math.abs(got - want) <= math.max(2L, want * 6 / 100),
        s"ndv for ${r.getString(0)}: $got vs exact $want")
    }
    // THE scale claim: sketches kill the Expand trap — every column's
    // stats come from ONE full-width scan, not a scan per column
    // (final adaptive section only; AQE's toString repeats the
    // initial plan below it)
    val p = approx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.linesIterator.count(_.contains("FileScan")) === 1,
      s"approx twin must make exactly one pass:\n$p")
    assert(!p.contains("Expand"),
      s"HLL aggregation must not expand rows per column:\n$p")
  }

  test("q_stats_hist approx twin tracks the exact catalog histogram") {
    val exact = SparkEntry.queries("q_stats_hist")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = graft.operators.Analytics.statsHistApprox(spark, sf)
      .collect()
    val colRows = exact.groupBy(_._1._1).view.mapValues(_.values.sum)
    // equal-height mass must be conserved per column...
    val approxCols = approx.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum)
    for ((c, n) <- colRows) assert(approxCols(c) === n,
      s"histogram for $c must cover every row")
    // ...and each bucket's count may differ from the exact form only
    // by boundary drift (the sketch returns a sample where the exact
    // form interpolates): ≤ 2% of the column's rows per bucket
    for (r <- approx) {
      val key = (r.getString(0), r.getLong(1))
      val tol = math.max(2L, colRows(r.getString(0)) / 50)
      assert(math.abs(r.getLong(2) - exact.getOrElse(key, 0L)) <= tol,
        s"bucket $key: approx ${r.getLong(2)} vs exact ${exact.get(key)}")
    }
    // the returned relation carries the boundaries as TRAINED
    // LITERALS (the codebook stance): no quantile of either kind may
    // appear in the consuming plan
    val plan = graft.operators.Analytics.statsHistApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      s"boundaries must ride as literals, not in-plan quantiles:\n$plan")
  }

  test("s_knn_topk_agg: bounded-heap agg equals the window form") {
    val win = SparkEntry.queries("s_knn_join")(spark, sf).collect().toSeq
    val agg = SparkEntry.queries("s_knn_topk_agg")(spark, sf).collect().toSeq
    assert(agg === win, "aggregator must reproduce the window ranking")
    // and it aggregates (partial merge map-side), never rank-windows —
    // the only Window allowed is the cell-occupancy count guard
    val plan = SparkEntry.queries("s_knn_topk_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      "no rank window in the aggregator plan")
    assert(plan.contains("Aggregate"), "expected an aggregate operator")
  }

  test("d_dup_clusters: label propagation reaches a fixpoint") {
    import graft.operators.Dedup
    val edges = Dedup.dupEdges(spark, sf).cache()
    val labels0 = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    val atIters = Dedup.propagate(edges, labels0, Dedup.Iters)
    val onceMore = Dedup.propagate(edges, atIters, 1)
    assert(atIters.except(onceMore).count() === 0 &&
      onceMore.except(atIters).count() === 0,
      s"${Dedup.Iters} rounds must reach the fixpoint on this corpus")
    // the representative is the component's min doc_id
    assert(atIters.filter(col("label") > col("doc_id")).count() === 0)
  }

  test("propagate: a 200-node CHAIN converges in O(log diameter) " +
    "rounds — the pointer jump's whole point") {
    import spark.implicits._
    import graft.operators.Dedup
    // a path graph 0-1-2-…-199: diameter 199. Plain min-label
    // propagation needs ~199 rounds for node 199 to learn label 0;
    // with the per-round pointer jump the known-minimum's reach at
    // least doubles per round, so 12 rounds must suffice.
    val n = 200
    val half = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val edges = half.unionAll(
      half.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .repartition(8).localCheckpoint(true)
    val labels0 = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    val got = Dedup.propagate(edges, labels0, 12)
    assert(got.filter(col("label") =!= 0L).count() === 0,
      "12 jump-rounds must flood a diameter-199 chain (O(log d))")
    // and the loop detected the fixpoint itself: one more round is
    // a no-op
    val again = Dedup.propagate(edges, got.select("doc_id", "label"), 1)
    assert(again.filter(col("label") =!= 0L).count() === 0)
    // the convergence CONTRACT (r12 advice): a round budget too small
    // for the diameter fails loudly instead of returning a partial,
    // jump-order-dependent flood that would diverge from any
    // plain-propagation oracle
    intercept[IllegalStateException] {
      Dedup.propagate(edges, labels0, 2)
    }
    // …unless the caller explicitly opts into a bounded partial flood
    val partial = Dedup.propagate(edges, labels0, 2,
      requireConverged = false)
    assert(partial.count() === n.toLong)
  }

  test("cluster map: materialized handle equals the inline recompute " +
    "and is shared across consumers") {
    import graft.operators.Dedup
    val m1 = Dedup.clusterMap(spark, sf)
    val m2 = Dedup.clusterMap(spark, sf)
    assert(m1 eq m2,
      "a second consumer must reuse the materialized handle, not rebuild")
    // inline recompute straight through the pipeline, no memo
    val edges = Dedup.dupEdges(spark, sf).localCheckpoint(true)
    val labels0 = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    val inline = Dedup.propagate(edges, labels0, Dedup.Iters)
      .select(col("doc_id"), col("label").as("cluster_id"))
    assert(m1.exceptAll(inline).isEmpty && inline.exceptAll(m1).isEmpty,
      "materialized map must equal the inline pipeline result")
  }

  test("d_dedup_corpus: singletons + one representative per cluster") {
    val corpus = SparkEntry.queries("d_dedup_corpus")(spark, sf)
    val clusters = SparkEntry.queries("d_dup_clusters")(spark, sf)
    val docs = Tables.documents(spark, sf)
    val dropped = clusters.filter(col("doc_id") =!= col("cluster_id"))
    assert(corpus.count() === docs.count() - dropped.count())
    // every cluster representative survives, every dropped member is gone
    assert(clusters.select(col("cluster_id").as("doc_id")).distinct()
      .join(corpus, Seq("doc_id"), "left_anti").count() === 0)
    assert(corpus.join(dropped.select("doc_id"), Seq("doc_id")).count() === 0)
  }

  test("s_centroids: exact integer mean per (label, position)") {
    val c = SparkEntry.queries("s_centroids")(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val dim = emb.select(size(col("embedding"))).distinct().collect()
    assert(dim.length === 1, "embeddings must share one dimensionality")
    val labels = emb.select("label").distinct().count()
    assert(c.count() === labels * dim.head.getInt(0))
    // micro-quantized means are bounded by the quantized component range
    assert(c.filter(abs(col("centroid_micro")) > 1000000L * 10).count() === 0)
    // group sizes add back up to the corpus
    assert(c.groupBy("label").agg(max("n_vectors").as("n"))
      .agg(sum("n")).head().getLong(0) === emb.count())
  }

  test("q_heatmap tiles partition all reports") {
    val h = SparkEntry.queries("q_heatmap")(spark, sf)
    assert(h.agg(sum("n_reports")).head().getLong(0) ===
      Tables.events(spark, sf).count())
  }

  test("d_exact keeps one representative per distinct text") {
    val d = SparkEntry.queries("d_exact")(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(d.count() ===
      docs.select(md5(col("text"))).distinct().count())
  }

  test("s_cosine_topk: probe's identical-vector twin scores 1.0") {
    // cosine of any vector with itself is 1.0 → 1,000,000 micro-units;
    // top-k scores are bounded by it
    val top = SparkEntry.queries("s_cosine_topk")(spark, sf)
    assert(top.filter(col("score_micro") > 1000000L).count() === 0)
  }

  test("Ids.withOrderedId: contiguous 1..n ids in key order, any " +
    "partitioning") {
    import spark.implicits._
    val df = Seq("m", "a", "z", "q", "b", "x").toDF("key")
      .repartition(5) // deliberately scrambled input partitioning
    val got = graft.operators.Ids.withOrderedId(df, Seq("key"), "id")
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq("a" -> 1L, "b" -> 2L, "m" -> 3L, "q" -> 4L,
      "x" -> 5L, "z" -> 6L))
  }

  test("Ids.withOrderedId: id-stage width is AQE-sizeable by default " +
    "(never above the session width), explicit override wins, and " +
    "ids are partitioning-invariant") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val df = spark.range(1000).toDF("key")
      // r21: the default leaves the range exchange coalescible — a
      // KB-sized dim materializes as 1-2 partitions instead of a
      // fixed session width (and a fact-sized dim still spreads);
      // the ceiling is the session conf, never a hardcoded constant
      val dflt = graft.operators.Ids.withOrderedId(df, Seq("key"), "id")
      assert(dflt.rdd.getNumPartitions <= 7,
        "default must stay within the session's shuffle width")
      assert(graft.operators.Ids.withOrderedId(df, Seq("key"), "id", 3)
        .rdd.getNumPartitions === 3, "explicit override must win")
      // and the assigned ids do not depend on the width
      val a = dflt.orderBy("key").collect().map(_.toSeq)
      val b = graft.operators.Ids.withOrderedId(df, Seq("key"), "id", 3)
        .orderBy("key").collect().map(_.toSeq)
      assert(a === b, "ids must be partitioning-invariant")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("r_player_upsert: updated_at only for re-seen, inserts after max") {
    val up = SparkEntry.queries("r_player_upsert")(spark, sf)
    val maxExisting = Tables.customer(spark, sf)
      .agg(max("c_custkey")).head().getLong(0)
    val inserted = up.filter(col("player_id") > maxExisting)
    // insert path taken; inserted rows carry defaults + created_at only
    assert(inserted.count() > 0)
    assert(inserted.filter(col("updated_at").isNotNull
      || col("created_at").isNull || col("confirmed_ban") =!= 0
      || col("name") =!= col("normalized_name")).count() === 0)
    // existing rows: updated_at iff re-seen this batch; never created_at
    val existing = up.filter(col("player_id") <= maxExisting)
    assert(existing.count() === Tables.customer(spark, sf).count(),
      "the upsert must keep every existing dim row")
    assert(existing.filter(col("created_at").isNotNull).count() === 0)
    assert(existing.filter(col("updated_at").isNotNull).count() > 0,
      "some existing players are re-seen and must get updated_at")
  }

  test("r_upsert_report: exactly one row per Unique_Report key") {
    val r = SparkEntry.queries("r_upsert_report")(spark, sf)
    val keys = Seq("reported_id", "reporting_id", "region_id",
      "manual_detect")
    assert(r.select(keys.map(col): _*).distinct().count() === r.count())
    // first-wins: kept created_at is the key's minimum ts
    val e = graft.operators.Star.enriched(spark, sf)
      .filter(col("reported_id").isNotNull)
      .groupBy(keys.map(col): _*).agg(min("ts").as("min_ts"))
    assert(r.join(e, keys).filter(col("created_at") =!= col("min_ts"))
      .count() === 0)
  }

  test("q_ban_flags: pushed-down filter partitions the banned set") {
    val q = SparkEntry.queries("q_ban_flags")(spark, sf)
    val banned = graft.operators.Star.playersWide(spark, sf)
      .filter(col("confirmed_ban") === 1).count()
    assert(q.agg(sum("n_players")).head().getLong(0) === banned)
  }

  test("broadcast survives in the cache-join plan") {
    val plan = SparkEntry.queries("r_cache_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join, got:\n$plan")
  }

  test("HLL distinct twin tracks q_world_stats' exact counts") {
    // exact count(DISTINCT x) carries every distinct value through the
    // shuffle; approx_count_distinct is a fixed-size HLL++ sketch that
    // merges map-side — the form the 100 TB report runs. rsd 0.02 ⇒
    // ±2% expected; assert ±5% against the exact per-group counts.
    val exact = SparkEntry.queries("q_world_stats")(spark, sf)
      .select("on_members_world", "on_pvp_world", "n_worlds").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = graft.operators.Star.worldStatsApprox(spark, sf)
      .select("on_members_world", "on_pvp_world", "n_worlds").collect()
    assert(approx.length === exact.size)
    for (r <- approx) {
      val key = (r.getLong(0), r.getLong(1))
      val est = r.getLong(2).toDouble
      val ex = exact(key).toDouble
      assert(math.abs(est - ex) / ex <= 0.05,
        s"HLL estimate $est too far from exact $ex for $key")
    }
    val plan = graft.operators.Star.worldStatsApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct") ||
      plan.contains("HyperLogLog"), "twin must aggregate via HLL sketch")
  }

  test("q_band_join: bucketed plan equals the naive quadratic join") {
    // the bucket-explode rewrite must reproduce the naive BETWEEN
    // semantics exactly — this is THE correctness property of the op
    import spark.implicits._
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("vc"))
    val a = e.select(col("event_id").as("x_id"),
      col("event_type").as("x_type"), col("vc").as("x_vc"))
    val b = e.select(col("event_id").as("y_id"),
      col("event_type").as("y_type"), col("vc").as("y_vc"))
    val naive = a.join(b,
        col("x_type") === col("y_type") && col("x_id") =!= col("y_id") &&
          abs(col("x_vc") - col("y_vc")) <= 50L, "left")
      .groupBy(col("x_id")).agg(count(col("y_id")).as("n_naive"))
    val got = SparkEntry.queries("q_band_join")(spark, sf)
    val diff = got.join(naive, col("event_id") === col("x_id"))
      .filter(col("n_close") =!= col("n_naive")).count()
    assert(diff === 0, "bucketed band join diverges from naive semantics")
  }

  test("q_interval_attr: attribution is bounded by the 6h window") {
    // total attributed events must equal the direct pair count
    val pairs = {
      val e = Tables.events(spark, sf)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("puid"),
          col("ts").as("pts"))
      val x = e.select(col("event_id").as("xid"),
        col("user_id").as("xuid"), col("ts").as("xts"))
      p.join(x, col("puid") === col("xuid") && col("xts") >= col("pts") &&
        col("xts") < col("pts") + expr("INTERVAL 6 HOURS") &&
        col("xid") =!= col("pid")).count()
    }
    val total = SparkEntry.queries("q_interval_attr")(spark, sf)
      .agg(sum("n_attr")).head().getLong(0)
    assert(total === pairs)
  }

  test("t_pack: chunks partition the corpus exactly") {
    val packed = SparkEntry.queries("t_pack")(spark, sf)
    val docs = Tables.documents(spark, sf)
    // every doc lands in exactly one chunk; char mass is conserved
    assert(packed.agg(sum("n_docs")).head().getLong(0) === docs.count())
    assert(packed.agg(sum("chunk_chars")).head().getLong(0) ===
      docs.agg(sum("n_chars")).head().getLong(0))
    // chunks within a source never interleave doc ranges
    val overlap = packed.alias("a").join(packed.alias("b"),
      col("a.source") === col("b.source") &&
        col("a.chunk_id") < col("b.chunk_id") &&
        col("a.last_doc") >= col("b.first_doc")).count()
    assert(overlap === 0, "chunk doc ranges interleave")
  }

  test("t_repetition: basis-point scores stay in range") {
    val r = SparkEntry.queries("t_repetition")(spark, sf)
    assert(r.filter(col("ttr_bp") < 1 || col("ttr_bp") > 10000 ||
      col("top_tok_bp") < 1 || col("top_tok_bp") > 10000).count() === 0)
  }

  test("d_contaminate flags only non-eval docs, each with real leaks") {
    val c = SparkEntry.queries("d_contaminate")(spark, sf)
    val inEval = c.filter(
      substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      .count()
    assert(inEval === 0, "eval docs must never appear as contaminated")
    assert(c.filter(col("n_leaked") < 1).count() === 0)
  }

  test("d_curate_corpus coheres with its component queries") {
    val curated = SparkEntry.queries("d_curate_corpus")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val dedupKeep = SparkEntry.queries("d_dedup_corpus")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val contaminated = SparkEntry.queries("d_contaminate")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val kept = SparkEntry.queries("t_filter")(spark, sf)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(curated.nonEmpty, "curation must keep a non-empty corpus")
    assert(curated.subsetOf(dedupKeep), "curated doc not a dedup keeper")
    assert(curated.intersect(contaminated).isEmpty,
      "contaminated doc survived curation")
    assert(curated.subsetOf(kept), "quality-dropped doc survived curation")
    // eval carve-out: no curated doc hashes into the 0x0_/0x1_ sample
    val evalPred = (id: Long) => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val first = "%02x".format(h(0)).charAt(0)
      first == '0' || first == '1'
    }
    assert(!curated.exists(evalPred), "eval doc survived curation")
  }

  test("t_filter: bitmask reasons are live and keep matches flags") {
    val f = SparkEntry.queries("t_filter")(spark, sf)
    assert(f.filter(col("keep") =!= (col("flags") === 0L)).count() === 0)
    // the synthetic corpus must exercise more than one drop reason,
    // or the filter is a dead path at test scale
    val reasons = f.filter(col("flags") > 0)
      .select(explode(expr(
        "filter(transform(sequence(0, 4), b -> " +
          "CASE WHEN (shiftright(flags, b) & 1) = 1 THEN b END), " +
          "x -> x IS NOT NULL)")).as("bit"))
      .select("bit").distinct().count()
    assert(reasons >= 2, s"only $reasons drop reasons fire on test data")
  }

  test("s_ann_ivf: one cell scanned, scores true, assignment map-only") {
    val ivf = SparkEntry.queries("s_ann_ivf")(spark, sf)
    val rows = ivf.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // the probe scans exactly its own centroid cell
    assert(rows.map(_.getAs[Long]("cell")).distinct.length === 1,
      "IVF probe must score candidates from a single cell")
    // scores are the true cosine for those candidates: cross-check
    // every returned (vec_id, score) against the brute-force kernel
    val brute = SparkEntry.queries("s_cosine_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (r <- rows; trueScore <- brute.get(r.getLong(0)))
      assert(r.getAs[Long]("score_micro") === trueScore,
        s"IVF rerank score drifted for vec ${r.getLong(0)}")
    // cell assignment must be an expression over the scan, not a join
    // against the centroid relation: the only join in the plan is the
    // broadcast of the 1-row probe
    val p = ivf.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the only join must be the broadcast probe join")
  }

  test("s_ann_recall: the evidence table covers every rung, rows are " +
    "internally consistent, and recall is monotone in nprobe") {
    val rows = SparkEntry.queries("s_ann_recall")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rungs = Seq("s_ann_lsh", "s_ann_multiprobe", "s_ann_ivf",
      "s_ann_ivf_km", "s_ann_ivf_probe", "s_ann_ivf_km_probe",
      "s_ann_pq", "s_ann_ivfpq", "s_ann_ivfpq_probe", "s_ann_sq8",
      "s_ann_graph_walk")
    assert(rows.keySet === rungs.toSet, "one row per ANN config")
    rows.values.foreach { case (hits, bp) =>
      assert(hits >= 0 && hits <= 10 && bp === hits * 1000)
    }
    // the recall dial must point the right way in the evidence a
    // user actually reads
    assert(rows("s_ann_ivf_probe")._1 >= rows("s_ann_ivf")._1,
      "nprobe=2 recall must be >= nprobe=1 (IVF)")
    assert(rows("s_ann_ivfpq_probe")._1 >= rows("s_ann_ivfpq")._1,
      "nprobe=2 recall must be >= nprobe=1 (IVF+PQ)")
    assert(rows("s_ann_multiprobe")._1 >= rows("s_ann_lsh")._1,
      "multi-probe LSH recall must be >= single-probe")
    assert(rows("s_ann_ivf_km_probe")._1 >= rows("s_ann_ivf_km")._1,
      "nprobe=2 recall must be >= nprobe=1 (km-trained IVF)")
  }

  test("s_ann_graph_walk: beam walk is deterministic, excludes the " +
    "probe, orders by exact score, and never regresses its entry") {
    import graft.operators.Similarity
    val got = SparkEntry.queries("s_ann_graph_walk")(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 10)
    assert(got.forall(_.getLong(0) != 0L), "the probe never self-reports")
    val scores = got.map(_.getLong(2))
    assert(scores.toSeq === scores.sortBy(-_).toSeq,
      "output is (score DESC, vec_id) ordered")
    // the frontier is BEST-SEEN (candidates always include the prior
    // frontier), so the walk's best score can never be worse than the
    // best of its raw entry stratum — the monotone-quality contract
    // that makes fixed-round termination safe
    val emb = Tables.embeddings(spark, sf)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val entryBest = emb.filter(col("vec_id") =!= 0)
      .orderBy("vec_id").limit(Similarity.WalkBeam)
      .crossJoin(broadcast(probe))
      .select(Similarity.nativeScoreMicro(spark, "embedding", "probe")
        .as("s"))
      .agg(max("s")).head().getLong(0)
    assert(got.head.getLong(2) >= entryBest,
      "beam search must not lose its best-seen candidate")
    // deterministic: the walk re-runs to the identical row set
    val again = SparkEntry.queries("s_ann_graph_walk")(spark, sf).collect()
    assert(again.toSeq === got.toSeq)
  }

  test("s_ann_ivf_probe: nprobe=2 widens the scan, recall is monotone") {
    val one = SparkEntry.queries("s_ann_ivf")(spark, sf).collect()
    val probe2 = SparkEntry.queries("s_ann_ivf_probe")(spark, sf)
    val two = probe2.collect()
    assert(two.nonEmpty && two.length <= 10)
    // candidates come from at most NProbe cells
    assert(two.map(_.getAs[Long]("cell")).distinct.length <=
      graft.operators.Similarity.NProbe)
    // candidates(nprobe=2) ⊇ candidates(nprobe=1) and the rerank is
    // the exact kernel, so recall@10 vs brute force cannot drop …
    val exact = SparkEntry.queries("s_cosine_topk")(spark, sf)
      .collect().take(10).map(_.getLong(0)).toSet
    val r1 = one.map(_.getLong(0)).toSet
    val r2 = two.map(_.getLong(0)).toSet
    assert((exact & r2).size >= (exact & r1).size,
      "widening the probe must never lose recall")
    // … and with a full result the 10th-best score can only improve
    if (one.length == 10 && two.length == 10)
      assert(two.map(_.getAs[Long]("score_micro")).min >=
        one.map(_.getAs[Long]("score_micro")).min,
        "top-10 floor must be monotone in nprobe")
    // the exploded probe cells keep the fetch a broadcast EQUI-join:
    // no nested-loop membership test, no shuffle of the corpus side
    val p = probe2.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the candidate fetch must stay a broadcast equi-join")
  }

  test("d_contaminate_bloom: sketch prefilter is row-identical to exact") {
    val exact = SparkEntry.queries("d_contaminate")(spark, sf)
      .collect().toSeq
    val bloom = SparkEntry.queries("d_contaminate_bloom")(spark, sf)
    assert(bloom.collect().toSeq === exact,
      "no-false-negative prefilter + exact confirm must not change rows")
    // and the plan really sheds work in the scan stage: the train-side
    // filter carries might_contain over the scalar-subquery sketch
    val p = bloom.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"bloom prefilter missing from the plan:\n$p")
  }

  test("t_vocab CMS twin: sketch estimates bound the exact counts") {
    val exact = SparkEntry.queries("t_vocab")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val totalToks = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").count()
    val support = 0.001
    val eps = 1e-4
    val approx = graft.operators.TextAnalysis
      .vocabApproxCms(spark, sf, k = 20, support = support, eps = eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Misra-Gries contract: every token above support*N must be
    // nominated; CMS contract: estimate never below the true count,
    // above it by at most eps*N (seeded sketch ⇒ deterministic here)
    val mustNominate = exact.filter(_._2 > support * totalToks)
    // a nominated token may still be cut by the top-k limit, but only
    // ever in favor of estimates at least as large
    for ((tok, n) <- mustNominate)
      assert(approx.contains(tok) ||
        (approx.size == 20 && approx.values.min >= n),
        s"frequent token '$tok' ($n) missing from sketch top-k")
    val inBoth = exact.filter { case (t, _) => approx.contains(t) }
    assert(inBoth.nonEmpty, "sketch top-k shares nothing with exact top-k")
    for ((tok, n) <- inBoth) {
      val est = approx(tok)
      assert(est >= n, s"CMS underestimated '$tok': $est < $n")
      assert(est <= n + math.ceil(eps * totalToks).toLong,
        s"CMS error for '$tok' beyond eps*N: $est vs $n")
    }
  }

  test("parquet scan prunes columns for t_tokens") {
    val scan = SparkEntry.queries("t_tokens")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(scan.contains("doc_id") && scan.contains("text"))
    assert(!scan.contains("ReadSchema: struct<doc_id:bigint,text:string,lang")
      || !scan.contains("n_chars"), "scan should not read unused columns")
  }

  test("q_funnel: stage timestamps strictly ordered, stages monotone") {
    val f = SparkEntry.queries("q_funnel")(spark, sf).cache()
    // a reached stage's timestamp is strictly after the previous one
    assert(f.filter(col("first_click").isNotNull &&
      !(col("first_click") > col("first_view"))).count() === 0)
    assert(f.filter(col("first_purchase").isNotNull &&
      (col("first_click").isNull ||
        !(col("first_purchase") > col("first_click")))).count() === 0)
    // stage flag coheres with which timestamps are present
    assert(f.filter(col("funnel_stage") === 1 &&
      col("first_click").isNotNull).count() === 0)
    assert(f.filter(col("funnel_stage") === 3 &&
      col("first_purchase").isNull).count() === 0)
    val Seq(s1, s2, s3) = Seq(1, 2, 3).map(k =>
      f.filter(col("funnel_stage") >= k).count())
    assert(s1 >= s2 && s2 >= s3 && s1 > 0, s"not monotone: $s1/$s2/$s3")
    f.unpersist()
  }

  test("q_retention: offset-0 cells equal cohort sizes, Mondays only") {
    val r = SparkEntry.queries("q_retention")(spark, sf).cache()
    assert(r.filter(col("week_offset") < 0).count() === 0)
    // ISO week truncation: every cohort week is a Monday (dayofweek=2)
    assert(r.filter(dayofweek(col("cohort_week")) =!= 2).count() === 0)
    // the signup event itself is activity at offset 0, so the offset-0
    // cell must hold the entire cohort
    val cohorts = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cd"))
      .groupBy(date_trunc("week", col("cd").cast("timestamp")).cast("date")
        .as("cohort_week"))
      .agg(countDistinct("user_id").as("cohort_n"))
    val mismatch = r.filter(col("week_offset") === 0)
      .join(cohorts, "cohort_week")
      .filter(col("n_users") =!= col("cohort_n")).count()
    assert(mismatch === 0, "offset-0 retention cell lost cohort members")
    r.unpersist()
  }

  test("t_mix_sample coheres with t_mix_plan and is deterministic") {
    val plan = SparkEntry.queries("t_mix_plan")(spark, sf).cache()
    val sel = SparkEntry.queries("t_mix_sample")(spark, sf).cache()
    assert(sel.count() > 0)
    // every selected doc is below its source's hash threshold
    val offPlan = sel.join(plan, "source")
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long") >= col("thresh_s")).count()
    assert(offPlan === 0, "selected doc above its source threshold")
    // never selects more than the source holds; plan masses positive
    assert(sel.groupBy("source").count().join(plan, "source")
      .filter(col("count") > col("cnt_s")).count() === 0)
    assert(plan.filter(col("w_s") <= 0 || col("thresh_s") < 0).count() === 0)
    // zero-RNG selection: a second run is row-identical
    val again = SparkEntry.queries("t_mix_sample")(spark, sf)
    assert(sel.exceptAll(again).count() === 0 &&
      again.exceptAll(sel).count() === 0)
    plan.unpersist(); sel.unpersist()
  }

  test("d_span_dup: shared counts equal the exact fp intersection") {
    import org.apache.spark.sql.expressions.Window
    val pairs = SparkEntry.queries("d_span_dup")(spark, sf)
      .limit(5).collect()
    assert(pairs.nonEmpty)
    val capped = graft.operators.TextAnalysis.fpRelation(spark, sf)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("fp_hash")))
      .filter(col("df") <= graft.operators.Dedup.MaxBucket)
      .select("doc_id", "fp_hash").cache()
    for (row <- pairs) {
      val (a, b) = (row.getLong(0), row.getLong(1))
      assert(a < b, "pair not canonically ordered")
      val inter = capped.filter(col("doc_id") === a)
        .join(capped.filter(col("doc_id") === b), "fp_hash").count()
      assert(inter === row.getAs[Long]("n_shared"),
        s"pair ($a,$b): reported ${row.getAs[Long]("n_shared")}, exact $inter")
    }
    capped.unpersist()
  }

  test("d_incr_dedup: covers the whole batch, dups point at the index") {
    val batch = SparkEntry.queries("d_incr_dedup")(spark, sf).cache()
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 4).count()
    assert(batch.count() === expected, "incremental gate lost batch rows")
    // dup targets live on the EXISTING side of the split, never in
    // the batch itself
    assert(batch.filter(col("dup_of").isNotNull &&
      col("dup_of") % 5 === 4).count() === 0)
    assert(batch.filter(col("is_dup") =!=
      col("dup_of").isNotNull).count() === 0)
    batch.unpersist()
  }

  test("d_incr_clusters: incremental merge ≡ corpus-wide recompute") {
    // THE maintenance contract: merging the 20% batch's edges into the
    // standing 80%-carve map is indistinguishable from rebuilding the
    // map over the whole corpus
    val incr = SparkEntry.queries("d_incr_clusters")(spark, sf)
      .collect().map(_.toString).sorted
    val full = SparkEntry.queries("d_dup_clusters")(spark, sf)
      .collect().map(_.toString).sorted
    assert(incr.length === full.length)
    assert(incr.toSeq === full.toSeq,
      "incremental maintenance diverged from the full recompute")
  }

  test("mergeClusters: a batch edge bridging two standing clusters " +
    "merges them; untouched clusters pass through bit-identical") {
    import spark.implicits._
    // standing map: {1,2,3} (rep 1), {10,11} (rep 10), {20,21} (rep 20)
    val existing = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    // batch: new doc 30 bridges clusters 1 and 10 (via members 3 and
    // 11); new docs 40,41 form their own component; cluster 20 untouched
    val half = Seq((30L, 3L), (30L, 11L), (40L, 41L))
      .toDF("doc_a", "doc_b")
    val edges = half.unionAll(
      half.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val merged = graft.operators.Dedup.mergeClusters(existing, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L,
      11L -> 1L, 30L -> 1L, 40L -> 40L, 41L -> 40L,
      20L -> 20L, 21L -> 20L))
  }

  test("cluster map as a refreshable lake table: refresh commits ONLY " +
    "changed rows (CDC-visible delta), read equals the in-memory " +
    "incremental merge, untouched rows never rewritten") {
    import graft.operators.Dedup
    import graft.sources.LakeMerge
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cmap_lake").toString
    val old = Dedup.oldClusterMap(spark, sf)
    Dedup.clusterTableInit(spark, dir, old)
    val v = Dedup.clusterTableRefresh(spark, dir,
      Dedup.batchEdges(spark, sf))
    assert(v === 1)
    // the refreshed table state == the in-memory incremental merge
    // (itself spec-pinned ≡ the corpus-wide recompute above)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val got = pairs(Dedup.clusterTableRead(spark, dir))
    val want = pairs(Dedup.mergeClusters(old, Dedup.batchEdges(spark, sf)))
    assert(got === want, "lake refresh diverged from mergeClusters")
    // the commit carries EXACTLY the changed assignments: the change
    // feed equals the (old -> new) difference, so untouched clusters
    // produce zero feed rows and zero rewritten bytes
    val oldPairs = pairs(old).toMap
    val expectedDelta = want.filterNot { case (d, c) =>
      oldPairs.get(d).contains(c) }.toMap
    assert(expectedDelta.nonEmpty, "carve must actually change rows")
    val feed = LakeMerge.changes(spark, dir, 0, Some(v))
      .filter(col("_change_type").isin("insert", "update"))
      .select("doc_id", "cluster_id")
    assert(pairs(feed).toMap === expectedDelta,
      "change feed must be exactly the changed assignments")
    // time travel still serves the pre-refresh map
    assert(pairs(LakeMerge.read(spark, dir, Some(0))
      .select("doc_id", "cluster_id")) === pairs(old))
  }

  test("t_chunk: windows tile every doc exactly — full stride steps, " +
    "no sub-window tails, bounded width") {
    val chunks = SparkEntry.queries("t_chunk")(spark, sf).cache()
    assert(chunks.filter(col("n_tokens") > graft.operators.TextAnalysis
      .ChunkW).count() === 0, "a window exceeded W")
    // a non-first window must add tokens beyond the previous one
    val minTail = graft.operators.TextAnalysis.ChunkW -
      graft.operators.TextAnalysis.ChunkStride
    assert(chunks.filter(col("chunk_idx") > 0 &&
      col("n_tokens") <= minTail).count() === 0,
      "a kept window was a strict sub-window of its predecessor")
    // coverage: the last window ends exactly at the doc's token count
    val stride = graft.operators.TextAnalysis.ChunkStride
    val ends = chunks
      .groupBy("doc_id")
      .agg(max(col("chunk_idx") * stride + col("n_tokens")).as("covered"),
        count(lit(1)).as("n_chunks"), max("chunk_idx").as("max_idx"))
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(filter(
        split(lower(trim(col("text"))), "\\s+"), t => t =!= ""))
        .cast("long").as("n"))
    assert(ends.join(toks, "doc_id")
      .filter(col("covered") =!= col("n")).count() === 0,
      "window union must cover the doc exactly")
    chunks.unpersist()
  }

  test("d_dup_span_ratio: exact-duplicate docs are fully covered; " +
    "short docs score zero") {
    val ratio = SparkEntry.queries("d_dup_span_ratio")(spark, sf).cache()
    assert(ratio.filter(col("dup_span_bp") < 0 ||
      col("dup_span_bp") > 10000).count() === 0)
    assert(ratio.filter(col("n_dup_pos") > col("n_tokens")).count() === 0)
    assert(ratio.filter(col("n_tokens") < graft.operators.Dedup.SpanGramN
      && col("dup_span_bp") =!= 0).count() === 0,
      "nothing shorter than the gram width can be a duplicated span")
    // a doc with an EXACT copy elsewhere shares every 8-gram ⇒ 100%
    val dupDocs = Tables.documents(spark, sf)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("doc_id"))
      .filter(col("n") >= 2).select("doc_id")
    val under = ratio.join(dupDocs, "doc_id")
      .filter(col("n_tokens") >= graft.operators.Dedup.SpanGramN &&
        col("dup_span_bp") =!= 10000).count()
    assert(under === 0, "an exact duplicate doc must be 100% covered")
    ratio.unpersist()
  }

  test("d_strip_spans: removal is exactly F17's coverage — kept = " +
    "total − covered; exact dups strip to nothing") {
    val strip = SparkEntry.queries("d_strip_spans")(spark, sf).cache()
    val ratio = SparkEntry.queries("d_dup_span_ratio")(spark, sf)
    // the two views must agree doc by doc: what F17 counts as covered
    // is precisely what F18 removes
    val mismatch = strip.join(ratio, Seq("doc_id"))
      .filter(strip("n_kept") =!= ratio("n_tokens") - ratio("n_dup_pos"))
      .count()
    assert(mismatch === 0, "strip/ratio accounting diverged")
    // a doc with an exact copy elsewhere loses every token
    val dupDocs = Tables.documents(spark, sf)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("doc_id"))
      .filter(col("n") >= 2).select("doc_id")
    assert(strip.join(dupDocs, "doc_id")
      .filter(col("n_tokens") >= graft.operators.Dedup.SpanGramN &&
        col("n_kept") =!= 0).count() === 0)
    strip.unpersist()
  }

  test("s_kmeans: assignment lands in trained clusters and actually " +
    "partitions the corpus") {
    val a = SparkEntry.queries("s_kmeans")(spark, sf).cache()
    assert(a.count() === Tables.embeddings(spark, sf).count(),
      "every vector gets exactly one cluster")
    val k = graft.operators.Similarity.kmeansKFor(
      Tables.embeddings(spark, sf).count())
    assert(a.filter(col("cluster") < 0 || col("cluster") >= k)
      .count() === 0)
    val used = a.select("cluster").distinct().count()
    assert(used >= 2 && used <= k,
      s"degenerate clustering: $used clusters in use")
    a.unpersist()
  }

  test("t_split_assign: deterministic, and split shares track the " +
    "hash-bucket design per source") {
    val s1 = SparkEntry.queries("t_split_assign")(spark, sf)
      .collect().map(_.toString)
    val s2 = SparkEntry.queries("t_split_assign")(spark, sf)
      .collect().map(_.toString)
    assert(s1.toSeq === s2.toSeq, "split must be a pure function of ids")
    val counts = SparkEntry.queries("t_split_assign")(spark, sf)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    // 254/1/1 of 256 buckets: train dominates, both holdouts small
    // but the corpus (500 docs) is small enough that either holdout
    // may draw zero docs — only the upper bounds are meaningful
    assert(counts.getOrElse("train", 0L) > total * 9 / 10)
    assert(counts.getOrElse("val", 0L) < total / 20)
    assert(counts.getOrElse("test", 0L) < total / 20)
  }

  test("t_lm_score: buckets follow the scalar thresholds and exact " +
    "duplicates score identically") {
    val sc = SparkEntry.queries("t_lm_score")(spark, sf).cache()
    assert(sc.count() === Tables.documents(spark, sf).count())
    assert(sc.filter(!col("bucket").isin("head", "middle", "tail"))
      .count() === 0)
    assert(sc.filter(col("n_bigrams") === 0 && col("bucket") =!= "tail")
      .count() === 0, "a doc with no bigrams cannot leave the tail")
    // bucket assignment must be consistent with the corpus mean
    val mean = sc.filter(col("n_bigrams") > 0)
      .agg(expr("sum(lm_bp) DIV count(*)")).head().getLong(0)
    assert(sc.filter(col("bucket") === "head" &&
      col("lm_bp") * 4 < mean * 5).count() === 0)
    assert(sc.filter(col("bucket") === "tail" && col("n_bigrams") > 0 &&
      col("lm_bp") * 4 >= mean * 3).count() === 0)
    // the LM is a pure function of text ⇒ exact dups score identically
    val dupPair = Tables.documents(spark, sf)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), collect_list("doc_id").as("ids"))
      .filter(col("n") >= 2).select(explode(col("ids")).as("doc_id"),
        col("h"))
    val spread = sc.join(dupPair, "doc_id")
      .groupBy("h").agg(countDistinct("lm_bp").as("d"))
      .filter(col("d") > 1).count()
    assert(spread === 0, "exact duplicate docs diverged in lm_bp")
    sc.unpersist()
  }

  test("t_tfidf: per-doc top-k is bounded, contiguous, and weight-" +
    "monotone with deterministic ties") {
    val tf = SparkEntry.queries("t_tfidf")(spark, sf).cache()
    val k = graft.operators.TextAnalysis.TfidfK
    val bad = tf.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"),
        min("rank").as("mn"))
      .filter(col("n") > k || col("mx") =!= col("n") || col("mn") =!= 1)
      .count()
    assert(bad === 0, "ranks must be 1..n with n <= k")
    // weight non-increasing in rank; equal weights break ties by term
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rank")
    val viol = tf
      .withColumn("pw", lag("weight", 1).over(w))
      .withColumn("pt", lag("term", 1).over(w))
      .filter(col("pw").isNotNull && (col("pw") < col("weight") ||
        (col("pw") === col("weight") && col("pt") >= col("term"))))
      .count()
    assert(viol === 0, "top-k ordering must be (weight DESC, term ASC)")
    tf.unpersist()
  }

  test("q_stickiness: MAU dominates DAU and the earliest day is its " +
    "own month") {
    val st = SparkEntry.queries("q_stickiness")(spark, sf).cache()
    assert(st.filter(col("mau") < col("dau")).count() === 0)
    assert(st.filter(col("stickiness_bp") <= 0 ||
      col("stickiness_bp") > 10000).count() === 0)
    // the first active day's 28-day window holds only itself
    val first = st.orderBy("day").head()
    assert(first.getLong(1) === first.getLong(2),
      "earliest day must have MAU == DAU")
    // spot-check one day's DAU against a direct distinct count
    val d = first.getDate(0)
    val direct = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit(d))
      .select("user_id").distinct().count()
    assert(first.getLong(1) === direct)
    st.unpersist()
  }

  test("s_ann_ivfpq: candidates come only from the probe's cell and " +
    "emit in ADC order") {
    val rows = SparkEntry.queries("s_ann_ivfpq")(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getLong(2)).distinct.length === 1,
      "every candidate must sit in the probe's coarse cell")
    val dists = rows.map(_.getLong(3))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
      "output must be ranked by approximate (ADC) distance")
    // cell restriction is real: all returned ids belong to the cell
    // the trained quantizer assigns them to, and it is the probe's
    val cb = graft.operators.Similarity.ivfCodebook(spark, sf)
    val cellOf = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.operators.Similarity.ivfCellCol(cb).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pcell = cellOf(0L)
    assert(rows.forall(r => cellOf(r.getLong(0)) === pcell),
      "returned ids must be the quantizer's own cell members")
  }

  test("d_cluster_sizes: histogram mass equals the cluster map and " +
    "no cluster is a singleton") {
    val h = SparkEntry.queries("d_cluster_sizes")(spark, sf).collect()
    assert(h.nonEmpty)
    assert(h.forall(_.getLong(0) >= 2L),
      "a cluster exists only where near-dups do — sizes start at 2")
    val mass = h.map(r => r.getLong(0) * r.getLong(1)).sum
    val mapRows = SparkEntry.queries("d_dup_clusters")(spark, sf).count()
    assert(mass === mapRows,
      "every clustered doc must be counted exactly once")
  }

  test("s_ann_ivfpq_probe: nprobe=2 candidates span at most 2 cells " +
    "and the ADC optimum is monotone in nprobe") {
    val two = SparkEntry.queries("s_ann_ivfpq_probe")(spark, sf).collect()
    val one = SparkEntry.queries("s_ann_ivfpq")(spark, sf).collect()
    assert(two.length === 10)
    assert(two.map(_.getLong(2)).distinct.length <=
      graft.operators.Similarity.NProbe)
    // superset candidacy: the best approximate distance can only
    // improve (or tie) when a second cell is probed
    assert(two.head.getLong(3) <= one.head.getLong(3),
      "widening the probe must not worsen the ADC optimum")
    val dists = two.map(_.getLong(3))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
  }

  test("q_skew_keys: top keys are frequency-sorted and shares are " +
    "consistent with the corpus total") {
    val sk = SparkEntry.queries("q_skew_keys")(spark, sf).collect()
    assert(sk.length === 10)
    val counts = sk.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "top-10 must be non-increasing in frequency")
    val total = Tables.events(spark, sf).count()
    val top = Tables.events(spark, sf).groupBy("user_id").count()
      .agg(max("count")).head().getLong(0)
    assert(counts.head === top, "rank 1 must be the true heaviest key")
    assert(sk.forall(r => r.getLong(2) === r.getLong(1) * 10000 / total))
  }

  test("q_rfm: codes are valid tier triples and track the scalar " +
    "thresholds") {
    val rfm = SparkEntry.queries("q_rfm")(spark, sf).cache()
    assert(rfm.count() ===
      Tables.orders(spark, sf).select("o_custkey").distinct().count(),
      "every ordering customer gets a segment")
    val badDigit = rfm.filter(
      !expr("rfm_code % 10").isin(0, 1, 2) ||
        !expr("(rfm_code DIV 10) % 10").isin(0, 1, 2) ||
        !expr("rfm_code DIV 100").isin(0, 1, 2)).count()
    assert(badDigit === 0, "each digit is a 0/1/2 tier")
    // the monetary digit must follow its threshold: recompute the mean
    val meanM = rfm.agg(expr("sum(m_cents) DIV count(*)")).head().getLong(0)
    assert(rfm.filter(col("m_cents") * 4 >= lit(meanM) * 5 &&
      col("rfm_code") % 10 =!= 2).count() === 0,
      "high spenders must carry the top monetary tier")
    assert(rfm.filter(col("m_cents") * 4 < lit(meanM) * 3 &&
      col("rfm_code") % 10 =!= 0).count() === 0,
      "low spenders must carry the bottom monetary tier")
    rfm.unpersist()
  }

  test("d_embed_clusters: every near-dup pair lands in one cluster") {
    val clusters = SparkEntry.queries("d_embed_clusters")(spark, sf).cache()
    // min-label CC: a cluster id is the smallest member, so never
    // exceeds its vec and is itself a clustered vec
    assert(clusters.filter(col("cluster_id") > col("vec_id")).count() === 0)
    val ids = clusters.select(col("cluster_id").as("vec_id")).distinct()
    assert(ids.join(clusters, "vec_id").count() === ids.count(),
      "cluster representative missing from its own cluster")
    // THE defining property: both ends of every F6 pair share a cluster
    val pairs = SparkEntry.queries("d_embed_dup")(spark, sf)
      .select("vec_a", "vec_b")
    val split = pairs
      .join(clusters.select(col("vec_id").as("vec_a"),
        col("cluster_id").as("ca")), "vec_a")
      .join(clusters.select(col("vec_id").as("vec_b"),
        col("cluster_id").as("cb")), "vec_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(split === 0, s"$split near-dup pairs split across clusters")
    clusters.unpersist()
  }

  test("r_dim_scd2: versions tile each user's history exactly") {
    import org.apache.spark.sql.expressions.Window
    val scd = SparkEntry.queries("r_dim_scd2")(spark, sf).cache()
    // exactly one open (current) version per user
    val multiOpen = scd.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(multiOpen === 0, "a user has zero or several current versions")
    // consecutive versions abut: valid_to == next valid_from, and the
    // state actually changes at each boundary
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val bad = scd
      .withColumn("next_from", lead("valid_from", 1).over(w))
      .withColumn("next_state", lead("state", 1).over(w))
      .filter(col("next_from").isNotNull &&
        (col("valid_to") =!= col("next_from") ||
          col("state") === col("next_state")))
      .count()
    assert(bad === 0, "SCD2 intervals overlap, gap, or repeat a state")
    scd.unpersist()
  }

  test("r_scd2_merge: merge(history, batch) ≡ rebuild over the union") {
    val merged = SparkEntry.queries("r_scd2_merge")(spark, sf)
      .collect().map(_.toString).sorted
    val rebuilt = SparkEntry.queries("r_dim_scd2")(spark, sf)
      .collect().map(_.toString).sorted
    assert(merged.length === rebuilt.length)
    assert(merged.toSeq === rebuilt.toSeq,
      "SCD2 maintenance diverged from the from-scratch rebuild")
  }

  test("scd2Merge: same-state batch opens NO version; a change closes " +
    "the open row at the change timestamp") {
    import spark.implicits._
    def ts(min: Long): java.sql.Timestamp =
      new java.sql.Timestamp(1700000000000L + min * 60000L)
    // standing history: user 1 open on state "view" since m0; user 2
    // open on "click" since m5 (after a closed "view" row)
    val existing = Seq(
      (1L, "view", ts(0), None: Option[java.sql.Timestamp], true),
      (2L, "view", ts(0), Some(ts(5)), false),
      (2L, "click", ts(5), None, true))
      .toDF("user_id", "state", "valid_from", "valid_to", "is_current")
    // batch: user 1 re-observes "view" (no change) then moves to
    // "purchase"; user 2 only re-observes "click"; user 3 is new
    val batch = Seq(
      (1L, "view", ts(10), 101L), (1L, "purchase", ts(12), 102L),
      (2L, "click", ts(11), 103L),
      (3L, "view", ts(13), 104L))
      .toDF("user_id", "state", "ts", "event_id")
    val out = graft.operators.Star.scd2Merge(existing, batch)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(3)).map(_.toString), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "view", Some(ts(12).toString), false), // closed AT the change
      (1L, "purchase", None, true),
      (2L, "view", Some(ts(5).toString), false), // untouched passthrough
      (2L, "click", None, true), // same-state batch ⇒ still open
      (3L, "view", None, true))) // new key bootstraps
  }

  test("q_histogram: buckets bounded, masses add up to the corpus") {
    val h = SparkEntry.queries("q_histogram")(spark, sf).cache()
    assert(h.filter(col("bucket") < 0 || col("bucket") > 9).count() === 0)
    // closed buckets hold only in-range cents; the top bucket is open
    assert(h.filter(col("bucket") < 9 &&
      (col("min_cents") < col("bucket_lo_cents") ||
        col("max_cents") >= col("bucket_lo_cents") + 1000)).count() === 0)
    assert(h.filter(col("bucket") === 9 &&
      col("min_cents") < 9000).count() === 0)
    val total = h.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
    h.unpersist()
  }

  test("q_pit_join: exactly one SCD2 version resolves per purchase") {
    val pit = SparkEntry.queries("q_pit_join")(spark, sf).cache()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    // tiling intervals (pinned in the SCD2 spec) make the join 1:1
    assert(pit.count() === purchases.count())
    assert(pit.select("event_id").distinct().count() === pit.count())
    pit.unpersist()
  }

  test("t_oov: OOV share bounded, vocab words never count as OOV") {
    val oov = SparkEntry.queries("t_oov")(spark, sf).cache()
    assert(oov.filter(col("oov_bp") < 0 || col("oov_bp") > 10000)
      .count() === 0)
    assert(oov.filter(col("n_oov") > col("n_tokens")).count() === 0)
    // a doc of ONLY top-vocab tokens must score 0 — synthesize one by
    // checking the corpus-wide invariant instead: total OOV instances
    // < total instances (the top-100 vocab certainly covers something)
    val tot = oov.agg(sum("n_oov"), sum("n_tokens")).head()
    assert(tot.getLong(0) < tot.getLong(1))
    oov.unpersist()
  }

  test("w_trailing: every event counts itself; frames never exceed " +
    "the user's history") {
    val t = SparkEntry.queries("w_trailing")(spark, sf).cache()
    assert(t.filter(col("n_1h") < 1).count() === 0)
    val perUser = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("total"))
    assert(t.join(perUser, "user_id")
      .filter(col("n_1h") > col("total")).count() === 0)
    t.unpersist()
  }

  test("d_ppjoin: the prefix filter is LOSSLESS vs the quadratic join") {
    // the prefix-filter lemma says no >=t pair can be missed — prove
    // it: the full cartesian token-set Jaccard >= 5000bp over the
    // same carve must equal the prefix-filtered result exactly
    val pp = SparkEntry.queries("d_ppjoin")(spark, sf)
      .select("doc_a", "doc_b", "jaccard_bp")
    val carve = Tables.documents(spark, sf)
      .join(graft.operators.Dedup.ppjoinEvalDocs(spark, sf), "doc_id")
      .select(col("doc_id"),
        array_distinct(filter(split(lower(trim(col("text"))), "\\s+"),
          t => t =!= "")).as("toks"))
    val quad = carve.select(col("doc_id").as("doc_a"), col("toks").as("t_a"))
      .crossJoin(carve.select(col("doc_id").as("doc_b"),
        col("toks").as("t_b")))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(expr("array_intersect(t_a, t_b)")).cast("long").as("inter"),
        (size(col("t_a")) + size(col("t_b"))).cast("long").as("sz_sum"))
      .withColumn("jaccard_bp", expr("inter * 10000 DIV (sz_sum - inter)"))
      .filter(col("jaccard_bp") >= graft.operators.Dedup.PpJoinMinBp)
      .select("doc_a", "doc_b", "jaccard_bp")
    assert(pp.exceptAll(quad).count() === 0 &&
      quad.exceptAll(pp).count() === 0,
      "prefix filtering lost or invented a >=t pair")
  }

  test("s_ann_rerank: exact-score ordering over the ADC shortlist " +
    "dominates the approx-ordered probe answer") {
    val rerank = SparkEntry.queries("s_ann_rerank")(spark, sf).collect()
    assert(rerank.length === 10)
    val scores = rerank.map(_.getLong(2)).toSeq
    assert(scores === scores.sortBy(-_),
      "answer must be ordered by exact score")
    // the re-rank picks the exact top-10 of a 50-candidate SUPERSET
    // of the probe's approx top-10, so its sorted exact scores must
    // dominate the probe answer's exact scores pointwise
    val probe = SparkEntry.queries("s_ann_ivfpq_probe")(spark, sf)
      .collect().map(r => r.getLong(r.fieldIndex("score_micro")))
      .sorted.reverse.toSeq
    scores.zip(probe).foreach { case (r, p) =>
      assert(r >= p, s"re-ranked $r must be >= approx-ordered $p") }
  }

  test("s_ann_filtered: every hit satisfies the predicate, ordering " +
    "is exact-score, and the filter only ever REMOVES candidates") {
    val hits = SparkEntry.queries("s_ann_filtered")(spark, sf).collect()
    assert(hits.nonEmpty && hits.length <= 10)
    assert(hits.forall(_.getInt(1) % 2 == 1),
      "a filtered search must never return a non-matching row")
    val scores = hits.map(_.getLong(3)).toSeq
    assert(scores === scores.sortBy(-_))
    // pre-filtering the G8 probe can only remove candidates: every
    // filtered hit is among the unfiltered probe's candidate pool,
    // i.e. appears in the unfiltered top-10 restricted to odd labels
    // OR scores below its floor
    val unfiltered = SparkEntry.queries("s_ann_ivf_probe")(spark, sf)
      .collect()
    val oddTop = unfiltered.filter(_.getInt(1) % 2 == 1)
      .map(r => r.getLong(0)).toSet
    val floor = unfiltered.map(_.getLong(3)).min
    assert(hits.forall(r =>
      oddTop.contains(r.getLong(0)) || r.getLong(3) <= floor),
      "filtered hits must be the odd-label slice of the same pool")
  }

  test("d_lsh_recall: one well-formed evidence row, deterministic, " +
    "caught never exceeds truth") {
    val r = SparkEntry.queries("d_lsh_recall")(spark, sf).collect()
    assert(r.length === 1)
    val (nTrue, nCaught, bp) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(nCaught <= nTrue)
    assert(bp >= 0 && bp <= 10000)
    if (nTrue > 0) assert(bp === nCaught * 10000 / nTrue)
    assert(SparkEntry.queries("d_lsh_recall")(spark, sf).collect()
      .toSeq === r.toSeq)
  }

  test("d_lsh_recall_curve: recall is monotone in the occupancy cap, " +
    "agrees with the single-cap row at MaxBucket, and shares one truth") {
    import graft.operators.Dedup
    val curve = SparkEntry.queries("d_lsh_recall_curve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(curve.map(_._1) === Dedup.RecallRungs.map(_.toLong))
    assert(curve.map(_._2).distinct.length === 1,
      "every rung measures the same truth set")
    val caught = curve.map(_._3)
    assert(caught === caught.sorted,
      "a wider cap can only catch more pairs")
    val single = SparkEntry.queries("d_lsh_recall")(spark, sf).head()
    val atMax = curve.find(_._1 == Dedup.MaxBucket.toLong).get
    assert(atMax._2 === single.getLong(0) &&
      atMax._3 === single.getLong(1) && atMax._4 === single.getLong(2),
      "the curve's MaxBucket rung must equal the production-cap row")
  }

  test("q_communities: LPA separates sparsely-bridged cliques where " +
    "connected components merge them; synchronized rounds, min-label " +
    "ties — fully deterministic") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val und = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ (4L, 11L)).toDF("a", "b")
    val got = graft.operators.Graph.lpa(und).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      11L -> 11L, 12L -> 11L, 13L -> 11L, 14L -> 11L),
      "the bridge must NOT fuse the two dense groups under LPA")
    // the contrast LPA exists for: components on the same graph
    // collapse to ONE (the bridge is reachability)
    val sym = und.select(col("a").as("doc_a"), col("b").as("doc_b"))
      .unionAll(und.select(col("b").as("doc_a"), col("a").as("doc_b")))
    val labels0 = sym.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    assert(graft.operators.Dedup.propagate(sym, labels0, 10)
      .select("label").distinct().count() === 1)
    // corpus query: runs, non-empty, repeat-deterministic
    val q = SparkEntry.queries("q_communities")(spark, sf).collect()
    assert(q.nonEmpty)
    assert(SparkEntry.queries("q_communities")(spark, sf)
      .collect().toSeq === q.toSeq)
  }

  test("ppjoin eval stratum is FIXED-SIZE: capped, deterministic, " +
    "and the cap is inactive below it (r13 scaling-curve fix)") {
    import graft.operators.Dedup
    val ev = Dedup.ppjoinEvalDocs(spark, sf)
    val n = ev.count()
    assert(n <= Dedup.PpJoinEvalCap)
    // below the cap the stratum IS the carve — oracle results at the
    // correctness sf are untouched by the cap
    val carveN = Tables.documents(spark, sf)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1")).count()
    if (carveN <= Dedup.PpJoinEvalCap)
      assert(n === carveN, "cap must be inactive under the cap size")
    // deterministic: two derivations agree exactly
    assert(ev.collect().map(_.getLong(0)).toSeq ===
      Dedup.ppjoinEvalDocs(spark, sf).collect().map(_.getLong(0)).toSeq)
    // and the cap actually binds on a corpus larger than itself: the
    // stratum is the md5-smallest members, never more than the cap
    val big = spark.range(0, 20000).toDF("doc_id")
      .withColumn("text", lit("x"))
    val capped = big
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
        .isin("0", "1"))
      .select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("_h"))
      .orderBy("_h", "doc_id").limit(Dedup.PpJoinEvalCap)
    assert(capped.count() === Dedup.PpJoinEvalCap,
      "a corpus-scale carve must clamp to exactly the cap")
  }

  test("d_minhash_est: the estimator tracks true word-set Jaccard") {
    // the MinHash contract is E[agree/k] = J over the hashed set
    // family (word shingles) — so the pin is against exact WORD-set
    // Jaccard, not the char-3-gram verify column (different family,
    // systematically higher on near-dups). k=16 ⇒ σ ≤ 1250 bp; 5000
    // bp = 4σ per pair.
    val est = SparkEntry.queries("d_minhash_est")(spark, sf)
      .limit(20).collect()
    assert(est.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
      .toMap
    for (r <- est) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      val estBp = r.getAs[Long]("est_bp")
      assert(estBp >= 0 && estBp <= 10000)
      val (sa, sb) = (toks(a), toks(b))
      val j = sa.intersect(sb).size * 10000L / sa.union(sb).size
      assert(math.abs(estBp - j) <= 5000,
        s"pair ($a,$b): est $estBp vs true word Jaccard $j")
    }
  }

  test("s_ann_pq: ADC order sound, rerank exact, finds true neighbors") {
    val pq = SparkEntry.queries("s_ann_pq")(spark, sf).collect()
    assert(pq.length === 10)
    val ad = pq.map(_.getAs[Long]("approx_dist"))
    assert(ad.zip(ad.tail).forall { case (x, y) => x <= y },
      "approx distances not ascending")
    val brute = SparkEntry.queries("s_cosine_topk")(spark, sf).collect()
    val top1 = brute.head.getAs[Long]("score_micro")
    // the rerank is the exact kernel, so no PQ score can beat brute top-1
    assert(pq.forall(_.getAs[Long]("score_micro") <= top1))
    val overlap = pq.map(_.getAs[Long]("vec_id")).toSet
      .intersect(brute.take(10).map(_.getAs[Long]("vec_id")).toSet)
    assert(overlap.nonEmpty, "PQ top-10 shares nothing with brute top-10")
  }

  test("s_ann_sq8: ADC order sound, rerank exact, recall ≥ PQ's") {
    val sq = SparkEntry.queries("s_ann_sq8")(spark, sf).collect()
    assert(sq.length === 10)
    val ad = sq.map(_.getAs[Long]("approx_dist"))
    assert(ad.zip(ad.tail).forall { case (x, y) => x <= y },
      "approx distances not ascending")
    val brute = SparkEntry.queries("s_cosine_topk")(spark, sf).collect()
    val top1 = brute.head.getAs[Long]("score_micro")
    // the rerank is the exact kernel, so no SQ8 score can beat brute top-1
    assert(sq.forall(_.getAs[Long]("score_micro") <= top1))
    // 64 B/vector of per-dim resolution should recall at least as much
    // of the true top-10 as PQ's 4 B subspace codes on this corpus
    val bruteTop = brute.take(10).map(_.getAs[Long]("vec_id")).toSet
    val sqHits = sq.map(_.getAs[Long]("vec_id")).toSet.intersect(bruteTop)
    val pqHits = SparkEntry.queries("s_ann_pq")(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet.intersect(bruteTop)
    assert(sqHits.size >= pqHits.size,
      s"SQ8 recalled ${sqHits.size} of brute top-10, PQ ${pqHits.size}")
  }

  test("d_source_overlap: full directed matrix, symmetric intersection " +
    "counts, containment bounded by the smaller side") {
    val m = SparkEntry.queries("d_source_overlap")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val sources = m.keySet.map(_._1) ++ m.keySet.map(_._2)
    assert(m.size === sources.size * (sources.size - 1),
      "one row per ordered source pair")
    for (((a, b), (common, bp)) <- m) {
      assert(bp >= 0 && bp <= 10000)
      assert(m((b, a))._1 === common,
        s"|A∩B| must not depend on direction ($a,$b)")
    }
  }

  test("s_diverse_sample: exact ⌈n/4⌉ quota per k-means cluster, " +
    "sample ⊆ cluster membership, flatter than the corpus") {
    val sample = SparkEntry.queries("s_diverse_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val full = SparkEntry.queries("s_kmeans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val assign = full.toMap
    assert(sample.forall { case (id, cl) => assign(id) == cl },
      "sampled rows must carry their true cluster assignment")
    val fullSizes = full.groupBy(_._2).map { case (cl, xs) => cl -> xs.length }
    val sampSizes = sample.groupBy(_._2).map { case (cl, xs) => cl -> xs.length }
    for ((cl, n) <- fullSizes)
      assert(sampSizes.getOrElse(cl, 0) === (n + 3) / 4,
        s"cluster $cl: quota must be ⌈$n/4⌉")
  }

  test("t_dataset_card: rollup grains reconcile — leaves sum to " +
    "source subtotals, subtotals to the grand total") {
    val rows = SparkEntry.queries("t_dataset_card")(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    val grand = rows.filter(r => r._1.isEmpty && r._2.isEmpty)
    assert(grand.length === 1)
    val leaves = rows.filter(r => r._1.nonEmpty && r._2.nonEmpty)
    val subs = rows.filter(r => r._1.nonEmpty && r._2.isEmpty)
    assert(grand.head._3 === leaves.map(_._3).sum &&
      grand.head._4 === leaves.map(_._4).sum &&
      grand.head._5 === leaves.map(_._5).sum)
    for (s0 <- subs) {
      val mine = leaves.filter(_._1 == s0._1)
      assert((s0._3, s0._4, s0._5) ===
        ((mine.map(_._3).sum, mine.map(_._4).sum, mine.map(_._5).sum)),
        s"subtotal mismatch for source ${s0._1.get}")
    }
    assert(rows.forall(r => r._5 <= r._3), "kept_docs must be ≤ n_docs")
  }

  test("t_cdc_chunk: chunks tile every doc exactly, and content-defined " +
    "boundaries RE-SYNCHRONIZE after an insertion (the property fixed " +
    "windows lack)") {
    import spark.implicits._
    // tiling on the real corpus
    val chunks = SparkEntry.queries("t_cdc_chunk")(spark, sf).collect()
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet === lens.keySet, "every doc chunked")
    for ((doc, rows) <- byDoc) {
      val ordered = rows.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === (1L to ordered.length),
        s"doc $doc chunk_idx contiguous")
      assert(ordered.head.getLong(2) === 1L, s"doc $doc starts at 1")
      assert(ordered.map(_.getLong(3)).sum === lens(doc),
        s"doc $doc chunk lengths must sum to its char count")
      assert(ordered.sliding(2).forall(p => p.length < 2 ||
        p(1).getLong(2) === p(0).getLong(2) + p(0).getLong(3)),
        s"doc $doc chunks contiguous")
    }
    // re-synchronization: same long text with a short insertion near
    // the front shares most chunk hashes with the original — a
    // fixed-width windowing shares none past the edit point
    val base = (1 to 400).map(i => s"w${i % 17}tok").mkString(" ")
    val edited = "INSERTED PREFIX " + base
    val two = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = graft.operators.TextAnalysis.cdcChunks(two).collect()
    val h1 = ch.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val h2 = ch.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    val shared = h1.intersect(h2).size
    assert(shared >= (h1.size * 2) / 3,
      s"boundaries must re-synchronize: only $shared of ${h1.size} " +
        "chunk hashes survive the insertion")
  }

  test("d_norm_exact: case/punctuation/whitespace variants collapse " +
    "to one group; corpus accounting exact") {
    import spark.implicits._
    val variants = Seq("Hello, World!", "hello world", "  hello   WORLD ",
      "hello-world").toDF("text")
    assert(variants.select(graft.operators.Dedup.normKey(col("text")))
      .distinct().count() === 1L, "all variants share one norm key")
    assert(Seq("hello world", "helloworld").toDF("text")
      .select(graft.operators.Dedup.normKey(col("text")))
      .distinct().count() === 2L, "token boundaries stay significant")
    val groups = SparkEntry.queries("d_norm_exact")(spark, sf).collect()
    assert(groups.map(_.getLong(2)).sum ===
      Tables.documents(spark, sf).count())
  }

  test("d_chunk_dup: accounting exact over the corpus; near-copies " +
    "share chunk mass through an offset-shifting edit, unique text " +
    "shares none") {
    import spark.implicits._
    val rows = SparkEntry.queries("d_chunk_dup")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet ===
      Tables.documents(spark, sf).select("doc_id").collect()
        .map(_.getLong(0)).toSet, "one row per doc")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1) &&
      r.getLong(4) <= r.getLong(3)), "dup mass bounded by total mass")
    assert(rows.forall(r => r.getLong(5) >= 0L && r.getLong(5) <= 10000L))
    assert(rows.map(_.getLong(3)).sum ===
      Tables.documents(spark, sf)
        .agg(sum(length(col("text")))).head().getLong(0),
      "chunk char mass conserves the corpus char mass")
    // constructed: B = A with a short insertion (all offsets shift);
    // C is unrelated. Content-defined boundaries must keep most of
    // A/B's shared mass in identical chunks; C must carry zero.
    val base = (1 to 500).map(i => s"tok${i % 23}x").mkString(" ")
    val docs = Seq((1L, base), (2L, "EDIT " + base),
      (3L, (1 to 500).map(i => s"zq${i % 29}w").mkString(" ")))
      .toDF("doc_id", "text")
    val st = graft.operators.Dedup.chunkDupStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(st(1L) >= 6000L && st(2L) >= 6000L,
      s"near-copies must share most chunk mass, got $st")
    assert(st(3L) === 0L, "unique doc shares no chunk")
  }

  test("t_mix_plan_dedup: stats ≡ the F9 deduped corpus per source; " +
    "plan math exact") {
    val plan = SparkEntry.queries("t_mix_plan_dedup")(spark, sf).collect()
    assert(plan.nonEmpty)
    val dd = SparkEntry.queries("d_dedup_corpus")(spark, sf).collect()
      .groupBy(_.getString(1))
      .map { case (src, rs) =>
        src -> ((rs.length.toLong, rs.map(_.getLong(2)).sum))
      }
    assert(plan.map(_.getString(0)).toSet === dd.keySet,
      "plan rows ≡ sources surviving dedup")
    for (r <- plan) {
      assert((r.getLong(1), r.getLong(2)) === dd(r.getString(0)),
        s"stats for ${r.getString(0)} disagree with d_dedup_corpus")
      assert(r.getLong(3) ===
        math.floor(math.sqrt(r.getLong(2).toDouble)).toLong)
      assert(r.getLong(5) === r.getLong(4) * 4294967296L / r.getLong(1))
    }
    val nTotal = plan.map(_.getLong(1)).sum
    assert(plan.map(_.getLong(4)).sum <= nTotal / 2,
      "Σ per-source takes never exceed the half-corpus budget")
  }

  test("d_rung_overlap: byte-exact drops are CONTAINED in " +
    "normalize-exact drops; sizes reconcile with the rung queries; " +
    "jaccard identity holds") {
    val rows = SparkEntry.queries("d_rung_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.keySet === Set(("exact", "norm"), ("exact", "neardup"),
      ("norm", "neardup")))
    // byte-exact duplicates ARE normalize-exact duplicates: the
    // containment is structural (normalization is deterministic), so
    // the intersection equals the exact side — pinned as an invariant
    val (ea, _, eb, _) = rows(("exact", "norm"))
    assert(eb === ea, "exact drop set must be ⊆ the norm drop set")
    for (((_, _), (na, nb, both, bp)) <- rows) {
      assert(both <= math.min(na, nb))
      val denom = na + nb - both
      assert(bp === (if (denom > 0) 10000L * both / denom else 10000L))
    }
    // sizes ≡ the component queries
    def dupTotal(q: String): Long =
      SparkEntry.queries(q)(spark, sf).collect()
        .map(r => r.getLong(r.length - 1) - 1L).sum
    assert(rows(("exact", "norm"))._1 === dupTotal("d_exact"))
    assert(rows(("exact", "norm"))._2 === dupTotal("d_norm_exact"))
    val nearDrops = SparkEntry.queries("d_dup_inflation")(spark, sf)
      .collect().map(r => r.getLong(1) - r.getLong(3)).sum
    assert(rows(("norm", "neardup"))._2 === nearDrops)
  }

  test("d_dedup_card: every rung column reconciles with its component " +
    "query") {
    val card = SparkEntry.queries("d_dedup_card")(spark, sf).collect()
    assert(card.nonEmpty)
    assert(card.map(_.getLong(1)).sum ===
      Tables.documents(spark, sf).count())
    // Σ exact/norm dup docs ≡ Σ (n_copies − 1) of the rung queries
    def dupTotal(q: String): Long =
      SparkEntry.queries(q)(spark, sf).collect()
        .map(r => r.getLong(r.length - 1) - 1L).sum
    assert(card.map(_.getLong(3)).sum === dupTotal("d_exact"),
      "exact rung reconciles with d_exact")
    assert(card.map(_.getLong(4)).sum === dupTotal("d_norm_exact"),
      "norm rung reconciles with d_norm_exact")
    // near-dup drops per source ≡ F24's n_docs − n_docs_dedup
    val infl = SparkEntry.queries("d_dup_inflation")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1) - r.getLong(3))).toMap
    for (r <- card)
      assert(r.getLong(5) === infl(r.getString(0)),
        s"near-dup rung disagrees with d_dup_inflation for ${r.getString(0)}")
    // chunk rung ≡ F25 rolled up by source
    val docSrc = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = SparkEntry.queries("d_chunk_dup")(spark, sf).collect()
      .groupBy(r => docSrc(r.getLong(0)))
      .map { case (src, rs) =>
        val cc = rs.map(_.getLong(3)).sum
        val dc = rs.map(_.getLong(4)).sum
        src -> (if (cc > 0) 10000L * dc / cc else 0L)
      }
    for (r <- card)
      assert(r.getLong(6) === bySrc.getOrElse(r.getString(0), 0L),
        s"chunk rung disagrees with d_chunk_dup for ${r.getString(0)}")
  }

  test("d_incr_chunk: exact re-derivation — batch chunks probed " +
    "against the standing distinct-md5 set; carve and bounds hold") {
    val out = SparkEntry.queries("d_incr_chunk")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) % 5 == 4), "batch carve respected")
    assert(out.forall(r => r.getLong(4) <= r.getLong(3) &&
      r.getLong(5) === 10000L * r.getLong(4) / r.getLong(3)))
    val chunks = graft.operators.TextAnalysis
      .cdcChunks(Tables.documents(spark, sf))
      .select("doc_id", "chunk_len", "chunk_md5").collect()
    val standing = chunks.filter(_.getLong(0) % 5 != 4)
      .map(_.getString(2)).toSet
    val expected = chunks.filter(_.getLong(0) % 5 == 4)
      .groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> ((rs.length.toLong, rs.map(_.getLong(1)).sum,
          rs.filter(r => standing(r.getString(2)))
            .map(_.getLong(1)).sum))
      }
    assert(out.map(_.getLong(0)).toSet === expected.keySet)
    for (r <- out)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ===
        expected(r.getLong(0)),
        s"doc ${r.getLong(0)} disagrees with the re-derivation")
  }

  test("d_dup_inflation: per-source accounting consistent with the " +
    "dedup corpus, inflation ≥ 10000 bp wherever defined") {
    val rows = SparkEntry.queries("d_dup_inflation")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= r.getLong(3) &&
      r.getLong(2) >= r.getLong(4)), "dedup mass never exceeds raw mass")
    assert(rows.forall(r => r.getLong(4) == 0L || r.getLong(5) >= 10000L),
      "inflation is ≥ 1× wherever the deduped mass is non-zero")
    val dedupN = SparkEntry.queries("d_dedup_corpus")(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum === dedupN,
      "Σ per-source dedup docs ≡ the F9 corpus row count")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.documents(spark, sf).count())
  }

  test("s_knn_graph: k per vector, no self edges, scores non-increasing " +
    "in rank, and every neighbor shares the vector's km cell") {
    val g = SparkEntry.queries("s_knn_graph")(spark, sf).collect()
    assert(g.nonEmpty)
    assert(g.forall(r => r.getLong(0) != r.getLong(1)), "no self edges")
    val byVec = g.groupBy(_.getLong(0))
    assert(byVec.values.forall(_.length <= graft.operators.Similarity.KnnGraphK))
    for ((_, rows) <- byVec) {
      val ordered = rows.sortBy(_.getLong(3))
      assert(ordered.map(_.getLong(3)).toSeq ===
        (1L to ordered.length).toSeq, "ranks are 1..n")
      assert(ordered.sliding(2).forall(p => p.length < 2 ||
        p(0).getLong(2) >= p(1).getLong(2)), "scores non-increasing")
    }
    // blocked on the km cells: both endpoints share at least one of
    // their KnnAssign assigned cells (multi-assignment, r14)
    val cells = knnAssignedCells(sf)
    assert(g.forall(r =>
      cells(r.getLong(0)).intersect(cells(r.getLong(1))).nonEmpty),
      "kNN-graph edges never cross the assigned-cell blocking")
  }

  /** Every vector's KnnAssign nearest km cells, re-derived through
    * the same expression the engine indexes with.
    */
  private def knnAssignedCells(dir: String): Map[Long, Set[Long]] = {
    import graft.operators.Similarity
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        slice(array_sort(Similarity.ivfCells(
          Similarity.knnCodebook(spark, dir))), 1, Similarity.KnnAssign)
          .as("cs"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSet)
      .toMap
  }

  test("q_ppr: mass stays inside the seed's 3-hop forward orbit, the " +
    "seed keeps its restart mass, and every row is positive") {
    val out = SparkEntry.queries("q_ppr")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0L))
    val edges = graft.operators.Graph.reportEdges(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val seed = nodes.min
    val adj = edges.groupBy(_._1).map { case (s0, es) =>
      s0 -> es.map(_._2).toSet
    }
    // forward BFS, 3 hops
    var frontier = Set(seed); var reach = Set(seed)
    for (_ <- 1 to 3) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
      reach ++= frontier
    }
    val got = out.map(_.getLong(0)).toSet
    assert(got.subsetOf(reach),
      "a node outside the 3-hop orbit can hold no walk mass")
    val seedRow = out.find(_.getLong(0) == seed)
    assert(seedRow.exists(_.getLong(1) >= 150000L),
      "the seed always keeps at least its restart mass")
  }

  test("l_version_diff: the state-derived diff agrees with the stored " +
    "CDC feed — two independent code paths, one verdict") {
    val diff = SparkEntry.queries("l_version_diff")(spark, sf).collect()
    val feed = SparkEntry.queries("l_change_feed")(spark, sf).collect()
    assert(diff.nonEmpty && diff.length === feed.length)
    // normalize to (type, k, cust, post_price, pre_price): the feed
    // carries the delete preimage in price_cents, the diff in
    // old_price_cents
    val dset = diff.map { r =>
      (r.getString(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))
    }.toSet
    val fset = feed.map { r =>
      val t = r.getString(0)
      val price = r.getLong(4)
      t match {
        case "delete" => (t, r.getLong(1), r.getLong(3), -1L, price)
        case "insert" => (t, r.getLong(1), r.getLong(3), price, -1L)
        case _        => (t, r.getLong(1), r.getLong(3), price,
          price / 2) // update doubled the price; preimage = half
      }
    }.toSet
    assert(dset === fset, "state diff and stored feed disagree")
  }

  test("s_knn_agreement: exact re-derivation from the kNN graph + " +
    "labels; bounds coherent") {
    val ag = SparkEntry.queries("s_knn_agreement")(spark, sf).collect()
    assert(ag.nonEmpty)
    assert(ag.forall(r => r.getLong(3) <= r.getLong(2) &&
      r.getLong(2) <= graft.operators.Similarity.KnnGraphK &&
      r.getLong(4) === 10000L * r.getLong(3) / r.getLong(2)))
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = SparkEntry.queries("s_knn_graph")(spark, sf)
      .select("vec_id", "nbr").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1)
      .map { case (v, es) =>
        v -> ((es.length.toLong,
          es.count(e => labels(e._2) == labels(v)).toLong))
      }
    assert(ag.map(_.getLong(0)).toSet === expected.keySet)
    for (r <- ag)
      assert((r.getLong(2), r.getLong(3)) === expected(r.getLong(0)),
        s"vec ${r.getLong(0)} agreement mismatch")
  }

  test("s_embed_drift: occupancy accounting exact — counts reconcile " +
    "with the corpus carve, shares sum to ~10000 bp, delta is TV mass") {
    val rows = SparkEntry.queries("s_embed_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nStanding = rows.map(_.getLong(1)).sum
    val nBatch = rows.map(_.getLong(2)).sum
    val emb = Tables.embeddings(spark, sf)
    assert(nBatch === emb.filter(col("vec_id") % 5 === 4).count())
    assert(nStanding + nBatch === emb.count())
    // integer-division shares: each side sums to 10000 − (truncation
    // loss < #cells)
    val sBp = rows.map(_.getLong(3)).sum
    val bBp = rows.map(_.getLong(4)).sum
    assert(sBp > 10000L - rows.length && sBp <= 10000L)
    assert(bBp > 10000L - rows.length && bBp <= 10000L)
    assert(rows.forall(r =>
      r.getLong(5) === math.abs(r.getLong(3) - r.getLong(4))))
  }

  test("s_knn_recall: accounting identity holds and the graph can " +
    "never be credited with edges it does not hold") {
    import graft.operators.Similarity
    val r = SparkEntry.queries("s_knn_recall")(spark, sf).head()
    val (nTrue, nCaught, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nCaught <= nTrue)
    assert(nTrue <=
      Similarity.KnnEvalProbes.toLong * Similarity.KnnGraphK)
    assert(bp === 10000L * nCaught / nTrue)
    // independent recount: truth ∩ graph, both re-derived
    val graphEdges = SparkEntry.queries("s_knn_graph")(spark, sf)
      .filter(col("vec_id") < Similarity.KnnEvalProbes)
      .select("vec_id", "nbr").collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    val emb = Tables.embeddings(spark, sf)
    val probes = emb.filter(col("vec_id") < Similarity.KnnEvalProbes)
      .select(col("vec_id"), col("embedding"))
    val truth = probes
      .join(emb.select(col("vec_id").as("nbr"),
        col("embedding").as("nbr_embedding")),
        col("nbr") =!= col("vec_id"))
      .select(col("vec_id"), col("nbr"),
        Similarity.nativeScoreMicro(spark, "embedding", "nbr_embedding")
          .as("s"))
      .collect().groupBy(_.getLong(0)).toSeq
      .flatMap { case (v, rows) =>
        rows.sortBy(x => (-x.getLong(2), x.getLong(1)))
          .take(Similarity.KnnGraphK).map(x => (v, x.getLong(1))).toSeq
      }.toSet
    assert(nTrue === truth.size.toLong)
    assert(nCaught === truth.intersect(graphEdges).size.toLong)
  }

  test("d_semdedup: min-id dominance exact vs the brute within-cell " +
    "pair relation (cells under-cap ⇒ the split policy must lose " +
    "nothing); per-cell min always kept") {
    import graft.operators.Similarity
    val out = SparkEntry.queries("d_semdedup")(spark, sf).collect()
    assert(out.nonEmpty)
    // kept ⟺ no keeper; evidence columns coherent
    assert(out.forall { r =>
      if (r.getLong(3) == 1L) r.isNullAt(4) && r.getLong(2) == 0L
      else !r.isNullAt(4) && r.getLong(4) < r.getLong(0) &&
        r.getLong(5) >= Similarity.SemDupMicro && r.getLong(2) >= 1L
    }, "kept/keeper/evidence coherence")
    // the globally smallest vec_id has no smaller-id witness anywhere
    assert(out.minBy(_.getLong(0)).getLong(3) === 1L,
      "the min-id vector is always kept")
    // brute: shared-assigned-cell smaller-id pairs ≥ τ (KnnAssign-way
    // multi-assignment, r14), exact kernel, NO split blocking — must
    // agree row-for-row
    import spark.implicits._
    val asgCells = knnAssignedCells(sf).toSeq
      .flatMap { case (v, cs) => cs.toSeq.map(c => (v, c)) }
      .toDF("vec_id", "acell")
    val withEmb = asgCells
      .join(Tables.embeddings(spark, sf)
        .select("vec_id", "embedding"), "vec_id")
    val a = withEmb.select(col("vec_id").as("va"), col("acell"),
      col("embedding").as("ea"))
    val b = withEmb.select(col("vec_id").as("vb"), col("acell"),
      col("embedding").as("eb"))
    val brute = a.join(b, Seq("acell")).filter(col("vb") < col("va"))
      .select(col("va"), col("vb"),
        Similarity.nativeScoreMicro(spark, "ea", "eb").as("s"))
      .distinct()
      .filter(col("s") >= Similarity.SemDupMicro)
      .groupBy("va")
      .agg(min("vb").as("k"), max("s").as("m"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    for (r <- out) {
      brute.get(r.getLong(0)) match {
        case Some((k, m, n)) =>
          assert(r.getLong(3) === 0L && r.getLong(4) === k &&
            r.getLong(5) === m && r.getLong(2) === n,
            s"vec ${r.getLong(0)} disagrees with brute dominance")
        case None =>
          assert(r.getLong(3) === 1L,
            s"vec ${r.getLong(0)} dropped without a brute witness")
      }
    }
  }

  test("s_range_search: every hit clears the radius with its EXACT " +
    "kernel score, and hits are a subset of the brute-force radius set") {
    import graft.operators.Similarity
    val hits = SparkEntry.queries("s_range_search")(spark, sf).collect()
    assert(hits.forall(_.getLong(3) >= Similarity.RangeMicro))
    // exactness + soundness vs the brute kernel over the whole corpus
    val emb = Tables.embeddings(spark, sf)
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val brute = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(probe))
      .select(col("vec_id"),
        Similarity.nativeScoreMicro(spark, "embedding", "probe")
          .as("score_micro"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (h <- hits) {
      assert(brute(h.getLong(0)) === h.getLong(3),
        "returned score must be the exact kernel score")
    }
    val bruteRadius = brute.filter(_._2 >= Similarity.RangeMicro).keySet
    assert(hits.map(_.getLong(0)).toSet.subsetOf(bruteRadius),
      "an approximate probe may miss radius members, never invent them")
  }

  test("s_mmr: greedy invariants — round 1 is the pure-relevance " +
    "argmax, later rounds trade relevance for diversity, output exact") {
    val sel = SparkEntry.queries("s_mmr")(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(sel.length === graft.operators.Similarity.MmrK)
    assert(sel.map(_.getLong(0)).toSeq ===
      (1L to graft.operators.Similarity.MmrK).toSeq)
    assert(sel.map(_.getLong(1)).distinct.length === sel.length,
      "5 distinct vectors selected")
    assert(sel.head.getLong(3) === 0L, "round 1 has no selected set")
    assert(sel.forall(r => r.getLong(4) === r.getLong(2) - r.getLong(3)),
      "mmr = rel − maxsim, exactly")
    // round 1 must agree with the exact re-rank's top answer
    val top = SparkEntry.queries("s_ann_rerank")(spark, sf).head()
    assert(sel.head.getLong(1) === top.getLong(0) &&
      sel.head.getLong(2) === top.getLong(2))
    assert(sel.tail.forall(r => r.getLong(3) >= -1000000L &&
      r.getLong(3) <= 1000000L),
      "maxsim is a cosine in micro-units (may be negative)")
  }

  test("q_kcore: synchronous peeling — a pendant chain peels layer by " +
    "layer, the clique survives as the 2-core, and an isolated edge " +
    "peels in round 1") {
    import spark.implicits._
    // triangle (1,2,3) with a chain 3-4-5 hanging off it, plus an
    // isolated edge (10,11): the chain peels outside-in (5 first,
    // then 4), both ends of the bare edge peel in round 1 (deg 1),
    // the triangle is the 2-core.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("a", "b")
    val got = graft.operators.Graph.kcoreOf(und).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((0L, 1L)), 2L -> ((0L, 1L)), 3L -> ((0L, 1L)),
      4L -> ((2L, 0L)), 5L -> ((1L, 0L)),
      10L -> ((1L, 0L)), 11L -> ((1L, 0L))))
    // corpus query: every node accounted for, rounds within the cap
    val q = SparkEntry.queries("q_kcore")(spark, sf).collect()
    assert(q.nonEmpty)
    assert(q.forall(r => r.getLong(1) >= 0 &&
      r.getLong(1) <= graft.operators.Graph.KcoreRounds))
    assert(q.forall(r => (r.getLong(2) == 1L) == (r.getLong(1) == 0L)),
      "in_core must be exactly peel_round == 0")
  }

  test("q_edge_jaccard: cn is the triangle count through the edge and " +
    "jaccard matches the set definition") {
    import spark.implicits._
    // K4 on {1,2,3,4}: every edge sits in 2 triangles, each endpoint
    // has degree 3 ⇒ jaccard = 2/(3+3-2-2) = 1 (10000 bp).
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b }
      yield (a, b)).toDF("a", "b")
    val gotK4 = graft.operators.Graph.edgeJaccardOf(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    for { a <- 1L to 4L; b <- 1L to 4L if a < b }
      assert(gotK4((a, b)) === ((2L, 10000L)), s"edge ($a,$b)")
    // path 1-2-3: no triangles; edge (1,2) has da 1, db 2 ⇒ divisor
    // 1+2-0-2 = 1 ⇒ jaccard 0; degenerate isolated edge (10,11) has
    // divisor 0 ⇒ defined as 0
    val path = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val gotP = graft.operators.Graph.edgeJaccardOf(path).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    assert(gotP((1L, 2L)) === ((0L, 0L)))
    assert(gotP((10L, 11L)) === ((0L, 0L)))
    // corpus: jaccard bounded, cn symmetric sum = 3 × triangles
    val q = SparkEntry.queries("q_edge_jaccard")(spark, sf).collect()
    assert(q.forall(r => r.getLong(5) >= 0 && r.getLong(5) <= 10000))
    // each triangle contributes 1 to the cn of each of its 3 edges AND
    // 1 to the count of each of its 3 vertices ⇒ the two sums agree
    val triSum = SparkEntry.queries("q_report_triangles")(spark, sf)
      .agg(sum("n_triangles")).head().getLong(0)
    assert(q.map(_.getLong(2)).sum === triSum,
      "Σ per-edge cn must equal Σ per-vertex triangle counts")
  }

  test("q_fof_reco: 2-hop candidates exclude direct neighbors and " +
    "mega-hub middles carry no recommendations") {
    import spark.implicits._
    // path 1-2-3 ⇒ 1 and 3 recommend each other through middle 2;
    // star hub 100 with FofHubCap+1 leaves contributes NOTHING (its
    // degree exceeds the cap), so leaves get no recommendations.
    val cap = graft.operators.Graph.FofHubCap
    val star = (1L to (cap + 1L)).map(i => (100L, 1000L + i))
    val und = (Seq((1L, 2L), (2L, 3L)) ++ star).toDF("a", "b")
    val got = graft.operators.Graph.fofRecoOf(und).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === Set((1L, 3L), (3L, 1L)),
      "only the path endpoints pair up; the over-cap hub is excluded")
    // corpus: rn within top-k, recommendations never adjacent
    val q = SparkEntry.queries("q_fof_reco")(spark, sf).collect()
    assert(q.nonEmpty)
    assert(q.forall(_.getLong(3) <= graft.operators.Graph.FofTopK))
  }
}
