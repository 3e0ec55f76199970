package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan audits — the properties that decide whether a query
  * survives a 100× scale-up, asserted on the actual executed plans:
  *
  *  1. filters and projections reach the parquet scan (PushedFilters
  *     / ReadSchema pruning),
  *  2. dim joins broadcast (no shuffle of the fact side),
  *  3. hot expressions stay inside WholeStageCodegen,
  *  4. top-k queries use TakeOrdered, never a global Sort+Limit.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    import org.apache.spark.sql.execution.debug._
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filter pushdown: event-type predicate reaches the parquet scan") {
    val df = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id")
    val f = formatted(df)
    assert(f.contains("PushedFilters") &&
      f.contains("IsNotNull(event_type)"),
      s"predicate did not reach the scan:\n$f")
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val f = formatted(df)
    val readSchema = f.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") &&
      !readSchema.contains("l_extendedprice"),
      s"scan reads columns the query never uses: $readSchema")
  }

  test("q3_topk: no fact-side sort — shuffle-hash joins, TakeOrdered " +
    "top-10") {
    // the r18 decade leg caught the default SMJ sorting the 60M-row
    // lineitem side at sf10 (11.4 GB spill, measured exponent 1.7 on
    // a linear query); the shuffle-hash hints build on the FILTERED
    // small relations and stream the fact unsorted — pinned here so a
    // hint regression or Catalyst change resurfaces loudly
    val p = plan(SparkEntry.queries("q3_topk")(spark, sf))
    assert(p.contains("ShuffledHashJoin"),
      s"q3_topk joins must plan shuffle-hash:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q3_topk must never sort the fact side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-10 must be a TakeOrdered, never a global sort")
  }

  test("q5_multijoin: every dim join is a broadcast join") {
    val p = plan(SparkEntry.queries("q5_multijoin")(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "dim joins must broadcast, not sort-merge")
  }

  test("r_fact_full: map-only — no exchange except the final order") {
    // fact assembly is hash-id re-keying: zero joins, zero windows.
    // The ONLY exchange allowed is the presentation orderBy's range
    // partitioning (dropped by production callers).
    val p = plan(SparkEntry.queries("r_fact_full")(spark, sf))
    assert(!p.contains("Join"), s"r_fact_full must not join:\n$p")
    assert(!p.contains("Window"), "r_fact_full must not use windows")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"expected at most the presentation-sort exchange, got $exchanges")
  }

  test("s_cosine_topk: TakeOrdered, not a global sort") {
    val p = plan(SparkEntry.queries("s_cosine_topk")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must tree-reduce, not globally sort:\n$p")
  }

  test("whole-stage codegen covers the cleanse battery") {
    // execute first: AQE only finalizes (and fuses codegen stages)
    // at runtime; the *(n) prefix then marks WholeStageCodegen spans
    val df = SparkEntry.queries("r_parse_props")(spark, sf)
    df.collect() // count() would build a NEW plan; collect finalizes THIS one
    val p = plan(df)
    assert(p.contains("*("),
      s"cleanse expressions must stay inside codegen:\n$p")
  }

  test("dim-id queries carry no window at all (partition-offset ids)") {
    // the r3 verdict's single-partition WindowExec findings, pinned
    // closed: id assignment is range-partition + zipWithIndex, so the
    // plans of every dim-building query are entirely window-free
    for (q <- Seq("r_dim_build", "r_dim_sighting", "r_fact_assemble",
        "r_resolve_v1", "r_player_upsert")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("Window"),
        s"$q must assign ids without any window:\n$p")
    }
  }

  test("r_upsert_report: first-wins ranking is key-partitioned, never " +
    "global — as a window, or as PerKeyTopK once another consumer has " +
    "enabled the rank-limit rewrite on the shared session") {
    val p = plan(SparkEntry.queries("r_upsert_report")(spark, sf))
    // the generalized rank-limit rewrite (plans/TopK.scala) replaces
    // the window with the bounded-heap operator when its rule is
    // installed; both forms must key on the natural key
    val line = p.linesIterator
      .find(l => l.contains("PerKeyTopK") || l.contains("Window"))
      .getOrElse("")
    assert(line.nonEmpty, s"first-wins needs a ranking operator:\n$p")
    assert(line.contains("reported_id") && line.contains("reporting_id"),
      s"ranking must partition by the natural key: $line")
  }

  test("q_ban_flags: derived-flag filter sits on a 2-column pruned scan") {
    val df = SparkEntry.queries("q_ban_flags")(spark, sf)
    val f = formatted(df)
    val readSchema = f.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    // every output column is c_custkey arithmetic, so the scan must
    // collapse to the single key column — nothing else of the
    // customer row is read
    assert(readSchema.contains("c_custkey"))
    assert(!readSchema.contains("c_name") &&
      !readSchema.contains("c_acctbal"),
      s"scan reads columns the flags never use: $readSchema")
  }

  test("AQE splits a skewed join partition (skew=true in the SMJ)") {
    // the runtime half of skew handling (q_salted_agg is the static
    // half): push the skew thresholds down to test-data scale and
    // verify AQE actually marks + splits the hot partition
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key vs 50 on each of 1000 others
      val skewed = spark.range(51000)
        .select(when($"id" < 50000, 7L).otherwise($"id" % 1000)
          .as("key"), $"id".as("payload"))
      val dim = spark.range(1000).select($"id".as("key"),
        concat(lit("v"), $"id").as("attr"))
      val joined = skewed.join(dim, "key")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("q_band_join: bucket rewrite avoids the nested-loop join") {
    // a non-equi band predicate naively plans as BroadcastNestedLoop
    // (O(n²) compares); the bucket explode must turn it into a hash
    // or sort-merge EQUI join on (type, bucket)
    val p = plan(SparkEntry.queries("q_band_join")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"band join fell back to a quadratic plan:\n$p")
  }

  test("t_pack: the packing window is partitioned by source") {
    // sequence packing must never funnel the corpus through ONE task:
    // the running-sum window is per-stratum, so every Window line in
    // the plan carries the source partition key
    val p = plan(SparkEntry.queries("t_pack")(spark, sf))
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(_.contains("source")),
      s"global (single-partition) packing window:\n${winLines.mkString("\n")}")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // the runtime half of join pruning: when a shuffle join's dim side
    // is filtered hard, Catalyst injects bloom_filter_might_contain on
    // the fact scan so non-joining rows die BEFORE the exchange. At
    // 100 TB this is the difference between shuffling the whole fact
    // and shuffling the ~join-selectivity fraction of it. Thresholds
    // are pushed down to test-data scale to trigger the rule.
    import java.nio.file.Files
    import spark.implicits._
    val base = Files.createTempDirectory("graft_bloom").toString
    spark.range(100000)
      .select($"id".as("k"), ($"id" % 1000).as("attr"))
      .write.mode("overwrite").parquet(s"$base/fact")
    spark.range(10000)
      .select($"id".as("k"), ($"id" % 50).as("cat"))
      .write.mode("overwrite").parquet(s"$base/dim")
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$base/fact")
      val dim = spark.read.parquet(s"$base/dim").filter($"cat" === 7)
      val joined = fact.join(dim, "k")
      val p = joined.queryExecution.executedPlan.toString
      // creation side: bloom_filter_agg over the filtered dim keys;
      // application side: might_contain() guarding the fact scan
      assert(p.contains("bloom_filter_agg") && p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("d_embed_dup: both self-join sides read the materialized cells") {
    val df = SparkEntry.queries("d_embed_dup")(spark, sf)
    val p = plan(df)
    // the capped-cell relation (plane dot products + occupancy window)
    // is the expensive subplan; it is materialized ONCE
    // (Similarity.cellsIndex — a lake-resident artifact table since
    // r13, or an eager localCheckpoint with persistence off) and both
    // join sides scan the materialized rows — the plan must show
    // artifact scans, never a re-derivation of the plane dot products
    val scans = p.linesIterator.count(l =>
      l.contains("Scan ExistingRDD") || l.contains("InMemoryTableScan")
        || l.contains("graft-artifacts"))
    assert(scans >= 2,
      s"expected both join sides on the materialized cells, found $scans:\n$p")
    // no corpus re-scan: the only parquet allowed is the artifact
    // table itself, never the embeddings table (which would mean the
    // plane dot products + occupancy window re-derive per consumer)
    assert(!p.contains("embeddings.parquet"),
      s"cells must come from the index artifact, not a fresh corpus scan:\n$p")
    assert(!p.contains("Window"),
      s"occupancy window must be paid at build time, not per consumer:\n$p")
    spark.catalog.clearCache()
  }

  test("d_curate_corpus: the corpus pass stays map-only (broadcast " +
    "anti-joins, quality gate in the scan)") {
    val df = SparkEntry.queries("d_curate_corpus")(spark, sf)
    df.collect() // finalize AQE on THIS plan
    val p = plan(df)
    // the contamination drop list is benchmark-suite-bounded — that
    // anti-join must broadcast. The near-dup drop list goes through
    // the size gate (Dedup.sizeGatedBroadcast): at test scale the
    // materialized list proves small, so BOTH anti-joins must
    // broadcast and the corpus side never shuffles; only a
    // corpus-scale dup mass may fall back to the shuffled shape
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"the contamination anti-join must broadcast:\n$p")
    val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
    assert(smj === 0,
      s"size-gated drop lists must broadcast here, found $smj SMJs:\n$p")
    // the quality gate must be fused into the corpus scan, not a
    // separate pass: the scan's DataFilters carry the text predicates
    assert(p.contains("regexp_extract_all"),
      "quality gate not fused into the scan stage")
    // the near-dup drop side must SCAN the materialized cluster-map
    // artifact (Dedup.clusterMap — lake-resident since r13), never
    // re-derive label propagation — the artifact-share stance the
    // dedup family documents, pinned here so a silently broken share
    // can be dismissed from the plan alone (r10 bench read 8× on a
    // contended host; this makes the artifact story auditable)
    assert(p.linesIterator.exists(l => l.contains("Scan ExistingRDD")
        || l.contains("graft-artifacts")),
      s"near-dup drop list must read the materialized cluster map:\n$p")
    spark.catalog.clearCache()
  }

  test("q_pivot: one aggregate pass, not the two-phase PivotFirst plan") {
    // the conditional-agg form must cost exactly one hash Exchange
    // (the group key); .pivot() would add a second one on
    // (group, pivot) — the regression this audit guards against
    val p = plan(SparkEntry.queries("q_pivot")(spark, sf))
    val hashEx = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashEx === 1,
      s"expected a single hash Exchange, found $hashEx:\n$p")
    assert(!p.contains("pivotfirst"), "two-phase pivot plan crept in")
  }

  test("t_fingerprint plan shuffles nothing before the distinct") {
    // one-pass winnowing: scan → project/explode → distinct; the only
    // exchanges belong to the distinct + presentation sort (2), never
    // a per-gram-row shuffle before aggregation
    val p = plan(SparkEntry.queries("t_fingerprint")(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"))
  }

  test("r_dim_scd2: both windows partition by user_id, never global") {
    val p = plan(SparkEntry.queries("r_dim_scd2")(spark, sf))
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, "SCD2 needs its lag/lead windows")
    assert(winLines.forall(_.contains("user_id")),
      s"a window lost its user_id partitioning:\n${winLines.mkString("\n")}")
  }

  test("r_scd2_merge: every window is user_id-partitioned, never global") {
    val p = plan(SparkEntry.queries("r_scd2_merge")(spark, sf))
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, "the merge needs its batch lag/lead windows")
    assert(winLines.forall(_.contains("user_id")),
      s"a maintenance window lost its key partitioning:\n${winLines.mkString("\n")}")
  }

  test("q_funnel: every stage joins/aggregates on user_id, no cartesian") {
    val df = SparkEntry.queries("q_funnel")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"funnel must stay equi-joined on the user key:\n$p")
  }

  test("t_mix_sample: the plan joins broadcast; the corpus never sorts") {
    // the 20-row sampling plan must reach the corpus scan as a
    // broadcast — a shuffled join here would re-partition the whole
    // corpus to apply a map-only integer compare
    val df = SparkEntry.queries("t_mix_sample")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"sampling plan must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side must not shuffle for the plan join:\n$p")
  }

  test("d_incr_dedup: verify side reads the standing gram artifact, " +
    "never a corpus re-scan") {
    // the r6 verdict's one 100×-scale breach, pinned closed: an ingest
    // batch may scan the documents table ONLY for its own carve
    // (doc_id % 5 = 4); the historical side contributes the band index
    // AND the gram-array verify relation as materialized artifacts
    // (lake-resident parquet since r13, or RDD scans with persistence
    // off), so batch cost is O(batch + candidates)
    val df = SparkEntry.queries("d_incr_dedup")(spark, sf)
    df.collect()
    val p = plan(df)
    val artScans = p.linesIterator.count(l =>
      l.contains("Scan ExistingRDD") || l.contains("graft-artifacts"))
    assert(artScans >= 2,
      s"band index AND gram artifact must be artifact scans, found $artScans:\n$p")
    // the historical carve's filter is NOT ((doc_id % 5) = 4) — if it
    // appears anywhere, the verify side re-derived grams from the
    // corpus instead of reading the artifact
    assert(!p.contains("NOT ((doc_id"),
      s"historical corpus re-scan crept back into the verify side:\n$p")
  }

  test("q_stickiness: rolling distinct is restated as fan-out + agg — " +
    "no window, no range join") {
    // the naive rolling COUNT(DISTINCT) is a global-sort window; the
    // scale form must be the 28× explode of the (day,user) distinct
    // relation with plain hash aggregations — nothing but equi-joins
    val df = SparkEntry.queries("q_stickiness")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("Window"),
      s"stickiness must not use a window function:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"stickiness must stay equi-joined on day:\n$p")
  }

  test("t_lm_score: bucket thresholds are broadcast scalars, no window") {
    // CCNet bucketing via global ntile would be a single-partition
    // sort; the scalar-mean form keeps the corpus map-only after the
    // count-model joins
    val df = SparkEntry.queries("t_lm_score")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("Window"),
      s"lm bucketing must not sort globally:\n$p")
  }

  test("t_tfidf: the top-k window partitions by doc_id, never global") {
    val p = plan(SparkEntry.queries("t_tfidf")(spark, sf))
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, "per-doc top-k needs its ranking window")
    assert(winLines.forall(_.contains("doc_id")),
      s"the tf-idf window lost its doc partitioning:\n${winLines.mkString("\n")}")
  }

  test("q_paths: sequence window is user-partitioned; top-10 " +
    "tree-reduces") {
    val df = SparkEntry.queries("q_paths")(spark, sf)
    df.collect()
    val p = plan(df)
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, "path extraction needs its lead() window")
    assert(winLines.forall(_.contains("user_id")),
      s"the sequence window lost its user partitioning:\n${winLines.mkString("\n")}")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 paths must tree-reduce, not globally sort:\n$p")
  }

  test("s_ann_ivfpq: cell fetch is a broadcast equi-join; ADC top-k " +
    "tree-reduces") {
    val df = SparkEntry.queries("s_ann_ivfpq")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the cell restriction must be a broadcast equi-join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"ADC top-k must tree-reduce, not globally sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the corpus must not shuffle for the probe:\n$p")
  }

  test("s_ann_pq: encode is map-only, top-k tree-reduces") {
    val df = SparkEntry.queries("s_ann_pq")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"ADC top-k must tree-reduce, not globally sort:\n$p")
    // PQ encode (argmin over the shipped codebook) is a projection —
    // no join or shuffle may appear below the probe broadcast
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"PQ encode must stay map-only:\n$p")
  }

  test("s_ann_sq8: encode is map-only, top-k tree-reduces") {
    val df = SparkEntry.queries("s_ann_sq8")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"ADC top-k must tree-reduce, not globally sort:\n$p")
    // SQ8 encode/reconstruct (shipped per-dim bounds) is a projection —
    // no join or shuffle may appear below the probe broadcast
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"SQ8 encode must stay map-only:\n$p")
  }

  test("q_promo_share: part dim broadcasts; fact never dim-shuffles") {
    val df = SparkEntry.queries("q_promo_share")(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the part dim must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the fact side must never shuffle for the dim:\n$p")
  }

  test("q_top_suppliers: dims broadcast, top-10 tree-reduces") {
    val df = SparkEntry.queries("q_top_suppliers")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must tree-reduce, not globally sort:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"supplier/nation dims must broadcast:\n$p")
  }

  test("q_stats_hist: per-column passes scan ONE column each; the " +
    "only sort is the 24-row presentation orderBy") {
    val df = SparkEntry.queries("q_stats_hist")(spark, sf)
    val f = formatted(df)
    val schemas = f.linesIterator
      .filter(_.trim.startsWith("ReadSchema")).map(_.trim).toSeq
    assert(schemas.size === 3,
      s"expected exactly three profiled-column scans:\n${schemas.mkString("\n")}")
    // equal-height histograms must not widen the scan: one column per
    // ReadSchema struct (a comma would mean a second field)
    assert(schemas.forall(s => !s.substringAfter("struct<").contains(",")),
      s"a histogram scan reads more than its own column:\n${schemas.mkString("\n")}")
    assert(Seq("l_quantity", "o_totalprice", "value").forall(c =>
      schemas.exists(_.contains(c))))
    val p = plan(df)
    assert(!p.contains("Window"), s"no window belongs here:\n$p")
  }

  test("graph queries: every round is hash joins + aggregates — no " +
    "cartesian, no nested-loop, no global window anywhere") {
    for (q <- Seq("q_suspicion_rank", "q_mutual_reports",
        "q_report_triangles", "q_report_components")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan a cartesian product:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a nested-loop join:\n$p")
      // graph rounds are joins + aggregates by construction: any
      // WindowExec appearing here means a sort snuck in
      assert(!p.contains("Window"), s"$q plans a window:\n$p")
    }
  }

  test("q_user_topk_rank / q_user_topk_dense: the tie-aware rewrites " +
    "fire — heap operator, no WindowExec, no input sort") {
    for (q <- Seq("q_user_topk_rank", "q_user_topk_dense")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("PerKeyTopK"), s"$q rewrite did not fire:\n$p")
      assert(!p.contains("Window"), s"$q: WindowExec survived:\n$p")
      assert(p.linesIterator.count(_.contains("PerKeyTopK")) === 2,
        s"$q: expected partial+final heap pair:\n$p")
    }
  }

  test("s_ann_ivf_km: assignment is map-only literals; the candidate " +
    "fetch is the one broadcast equi-join") {
    val p = plan(SparkEntry.queries("s_ann_ivf_km")(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"the km-codebook IVF fetch must stay a broadcast equi-join:\n$p")
    assert(p.contains("TakeOrdered"), "rerank must tree-reduce")
  }

  test("t_strip_html: the strip chain is map-only — zero exchanges " +
    "before the presentation sort") {
    val df = SparkEntry.queries("t_strip_html")(spark, sf)
    val p = plan(df)
    // one allowed exchange: the final orderBy's range partitioning
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"strip + gate must fuse into the scan stage:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
  }

  test("d_ppjoin: the fixed-size eval stratum reaches the token scan " +
    "as a BroadcastHashJoin — the cap is also the plan guard") {
    // PpJoinEvalCap bounds the stratum at any corpus size, so the
    // doc-id semi-join against the token relation must broadcast —
    // a shuffled join here would mean the bound is not being
    // exploited and the corpus-side scan pays a full exchange
    val df = SparkEntry.queries("d_ppjoin")(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"eval stratum must broadcast into the token scan:\n$p")
  }

  test("d_source_overlap: totals broadcast, no cartesian — the pair " +
    "join is keyed on gram") {
    val df = SparkEntry.queries("d_source_overlap")(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"),
      s"the source-pair matrix must come from the gram equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the S-row totals join must broadcast:\n$p")
  }

  test("d_source_overlap_sketch: agreement joins the seed-keyed S·k " +
    "relations, totals broadcast, no cartesian, and the corpus is " +
    "never re-hashed (the signature artifact serves the source sigs)") {
    val df = SparkEntry.queries("d_source_overlap_sketch")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(!p.contains("CartesianProduct"),
      s"the agreement matrix must come from the seed equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the S-row totals joins must broadcast:\n$p")
    // the per-source signatures derive from the STANDING minhash
    // artifact, not a fresh corpus tokenization: the only md5 calls
    // in the plan are the artifact build's, which this query's plan
    // must not contain (it reads the committed parquet)
    assert(!p.contains("md5("),
      s"source sigs must come from the signature artifact, not a re-hash:\n$p")
    spark.catalog.clearCache()
  }

  test("t_dataset_card: ROLLUP's three grains cost ONE aggregation " +
    "exchange (plus the presentation sort)") {
    val df = SparkEntry.queries("t_dataset_card")(spark, sf)
    val p = plan(df)
    assert(p.contains("Expand"),
      s"rollup should expand grouping sets before the partial agg:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2,
      s"card must not re-shuffle per grain:\n$p")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
  }

  test("s_hybrid_topk: query terms and df BROADCAST onto the standing " +
    "postings index — the only shuffles are the per-doc score " +
    "aggregate and the tiny rank windows; no SMJ, no cartesian") {
    val df = SparkEntry.queries("s_hybrid_topk")(spark, sf)
    df.collect() // finalize AQE
    val p = plan(df)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"query-term and df joins must broadcast:\n$p")
    // the ONLY sort-merge join allowed is the rank FUSION itself — a
    // full-outer join of two ≤RerankC-row rank lists (full outer
    // cannot broadcast); the corpus-scale sparse leg must never SMJ
    val smjLines = p.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(smjLines.forall(_.contains("FullOuter")),
      s"only the tiny full-outer fusion join may sort-merge:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"no nest-loop belongs here:\n$p")
    // the lexical leg reads the STANDING bm25 postings artifact, not
    // a fresh corpus tokenization (the L21 artifact-share stance)
    assert(p.linesIterator.exists(l => l.contains("Scan ExistingRDD")
        || l.contains("graft-artifacts")),
      s"the sparse leg must read the standing bm25 index:\n$p")
    spark.catalog.clearCache()
  }

  test("d_dedup_card: the near-dup drop join broadcasts and the hash " +
    "rungs shuffle thin md5 keys, never the text column") {
    val df = SparkEntry.queries("d_dedup_card")(spark, sf)
    df.collect() // finalize AQE
    val p = plan(df)
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftOuter")),
      s"the cluster-map drop list must broadcast:\n$p")
    // the window-min rungs partition on the md5 key k — the fat text
    // column must be projected away BEFORE the exchange
    val exchangeLines = p.linesIterator
      .filter(_.contains("hashpartitioning(k")).toSeq
    assert(exchangeLines.nonEmpty,
      s"expected the hash rungs' k-keyed exchanges:\n$p")
    assert(!exchangeLines.exists(_.contains("text")),
      s"the text column must never ride a rung exchange:\n$p")
    spark.catalog.clearCache()
  }

  test("d_incr_chunk: the standing side is the materialized chunk " +
    "index, and only the BATCH carve is chunked at query time") {
    val df = SparkEntry.queries("d_incr_chunk")(spark, sf)
    df.collect()
    val p = plan(df)
    assert(p.linesIterator.exists(l => l.contains("Scan ExistingRDD")
        || l.contains("graft-artifacts")),
      s"the probe must read the standing chunk-index artifact:\n$p")
    // the batch filter reaches the documents scan: the corpus is
    // never re-chunked for an incremental probe
    assert(p.contains("(doc_id#") && p.contains("% 5)"),
      s"the batch carve must sit in the scan stage:\n$p")
    spark.catalog.clearCache()
  }

  test("banded builders: bucket occupancy is never a bucket-key window") {
    // the r14 verdict's one systemic scale finding, pinned closed: a
    // count(*) OVER (PARTITION BY bucket-key) funnels the hot bucket
    // the MaxBucket/MaxCell caps exist to defuse into ONE WindowExec
    // task AQE cannot split. Occupancy.attach replaces it with a
    // map-side-combinable groupBy joined back, so these candidate
    // plans must carry no Window node at all
    for (q <- Seq("d_minhash_lsh", "d_simhash_pairs", "d_span_dup",
        "d_lsh_jaccard", "d_lsh_recall", "d_lsh_recall_curve")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE before reading the plan
      val p = plan(df)
      assert(!p.contains("Window"),
        s"$q counts bucket occupancy with a window again:\n$p")
    }
    spark.catalog.clearCache()
  }

  test("cells: quantizer-cell occupancy is a groupBy+join, no window") {
    val df = graft.operators.Similarity.cells(Tables.embeddings(spark, sf))
    df.collect()
    val p = plan(df)
    assert(!p.contains("Window"),
      s"cells counts cell occupancy with a window again:\n$p")
  }

  test("s_knn_graph: the only window is the per-vector top-k rank — " +
    "cell occupancy must not appear as a cell-partitioned window") {
    // the worst r14 offender: partition key = km cell, cardinality k,
    // so ONE task buffered n/k of the corpus by construction. The
    // occupancy side is now a broadcast of the k-row counts relation;
    // the surviving window partitions by vec_id (per-vector rank — a
    // corpus-cardinality key, exactly what a window is for)
    val df = SparkEntry.queries("s_knn_graph")(spark, sf)
    df.collect()
    val p = plan(df)
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(l => l.contains("vec_id")),
      s"a window lost its vec_id partitioning:\n${winLines.mkString("\n")}")
    assert(!winLines.exists(_.contains("partitionBy(cell")) &&
      !winLines.exists(l => l.contains("cell_n")),
      s"cell occupancy crept back into a window:\n${winLines.mkString("\n")}")
    spark.catalog.clearCache()
  }

  test("s_diverse_sample approx twin: window-free plan, per-cluster " +
    "keeps within binomial tolerance of the exact quota (r15 verdict #4)") {
    val approx = graft.operators.Similarity.sDiverseSampleApprox(spark, sf)
    approx.collect()
    val p = plan(approx)
    assert(!p.contains("Window"),
      s"the approx twin must not window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"occupancy must join back as a broadcast (k-row counts):\n$p")
    // exact quota per cluster from the oracle-gated window form
    val exact = SparkEntry.queries("s_diverse_sample")(spark, sf)
      .groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = approx.groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.keySet.subsetOf(exact.keySet),
      "approx must not invent clusters")
    // kept_c ~ Binomial(n_c, quota_c/n_c): |kept - quota| within
    // 4.5 sd + 2 per cluster (deterministic given md5 — this either
    // holds forever or fails now), and the total within 5%
    for ((c, q) <- exact) {
      val k = kept.getOrElse(c, 0L)
      val n = q * 4.0 // quota ≈ n/4 ⇒ n ≈ 4q (tolerance input only)
      val tol = 4.5 * math.sqrt(n * 0.25 * 0.75) + 2
      assert(math.abs(k - q) <= tol,
        s"cluster $c: kept $k vs quota $q exceeds binomial tol $tol")
    }
    val (totK, totQ) = (kept.values.sum.toDouble, exact.values.sum.toDouble)
    // total is Binomial(N, ~1/4) too: 4.5 sd on N ≈ 4·quota (a fixed
    // percentage bound would spuriously tighten as the corpus shrinks)
    val totTol = 4.5 * math.sqrt(totQ * 4.0 * 0.25 * 0.75) + 2
    assert(math.abs(totK - totQ) <= totTol,
      s"total kept $totK vs quota $totQ exceeds binomial tol $totTol")
    spark.catalog.clearCache()
  }

  test("sorted_intersect_count: equals size(array_intersect) pair for " +
    "pair on the real gram relation, and generates into codegen (r16)") {
    import graft.operators.Dedup
    val garr = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.gramArrayCol.as("grams"))
    val pairs = garr.select(col("doc_id").as("doc_a"), col("grams").as("g_a"))
      .join(garr.select(col("doc_id").as("doc_b"), col("grams").as("g_b")),
        col("doc_a") + 1 === col("doc_b"))
    val both = pairs.select(col("doc_a"),
      graft.functions.SortedIntersectCount
        .count(col("g_a"), col("g_b")).as("fast"),
      size(expr("array_intersect(g_a, g_b)")).cast("long").as("ref"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    val bad = rows.filter(r => r.getLong(1) != r.getLong(2))
    assert(bad.isEmpty,
      s"kernel mismatch on ${bad.length} pairs; first: ${bad.headOption}")
    // the merge loop stays inside whole-stage codegen
    val p = plan(both)
    val line = p.linesIterator.find(_.contains("sorted_intersect_count"))
      .getOrElse(fail(s"no sorted_intersect_count node in plan:\n$p"))
    assert(line.contains("*("),
      s"sorted_intersect_count fell out of whole-stage codegen:\n$p")
    // degenerate inputs: empty vs empty and empty vs non-empty are 0
    val edge = spark.sql(
      "SELECT array() AS a, array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS b")
      .select(
        graft.functions.SortedIntersectCount.count(
          expr("CAST(a AS ARRAY<BIGINT>)"), col("b")).as("e1"),
        graft.functions.SortedIntersectCount.count(col("b"), col("b"))
          .as("e2"))
      .head()
    assert(edge.getLong(0) === 0L && edge.getLong(1) === 2L)
  }

  test("ivf_cells: generates into WholeStageCodegen — no fallback " +
    "breaking the projection stage (r15 verdict #3)") {
    // a CodegenFallback expression forces the WHOLE projection stage
    // it sits in out of whole-stage codegen; the doGenCode path keeps
    // the stage fused — visible as the `*(n)` prefix on the Project
    // that carries the expression
    val codebook = Array(
      (0L, Array(0L, 0L, 0L, 0L)),
      (1L, Array(1000000L, 0L, 0L, 0L)),
      (2L, Array(0L, 1000000L, 0L, 0L)))
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.functions.IvfCells.cells(col("embedding"), codebook)
          .as("cells"))
    df.collect()
    val p = plan(df)
    val line = p.linesIterator.find(_.contains("ivf_cells"))
      .getOrElse(fail(s"no ivf_cells node in plan:\n$p"))
    assert(line.contains("*("),
      s"ivf_cells fell out of whole-stage codegen:\n$p")
  }

  test("ivf_cells: codegen and interpreted paths agree bit-for-bit, " +
    "null/ragged elements null the whole array, equality is by value") {
    val codebook = Array(
      (7L, Array(250000L, -1500000L)),
      (9L, Array(0L, 333333L)))
    val c = graft.functions.IvfCells.cells(col("embedding"), codebook)
    val rows = spark.createDataFrame(Seq(
      (1L, Seq(0.25f, -1.5f)),
      (2L, Seq(0.3333335f, 0.0f)),
      (3L, Seq(1.0f))))          // ragged: wrong dim
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), c.as("cells"))
      .orderBy("vec_id").collect()
    // row 1 sits exactly on centroid 7 → dist 0 for cell 7
    val r1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(r1.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((0L, 7L), (3423609888889L, 9L)))
    // codegen path == interpreted eval (the parity the oracle gates
    // ride on): re-evaluate row 2's struct list interpretedly
    val expr2 = graft.functions.IvfCells(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0.3333335f, 0.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      codebook.map(_._1).toIndexedSeq,
      codebook.map(_._2.toIndexedSeq).toIndexedSeq)
    val interp = expr2.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val r2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert((0 until 2).forall { i =>
      interp.getStruct(i, 2).getLong(0) == r2(i).getLong(0) &&
      interp.getStruct(i, 2).getLong(1) == r2(i).getLong(1)
    }, "codegen and interpreted eval disagree")
    // ragged row → whole-array NULL (stricter contract, documented)
    assert(rows(2).isNullAt(1), "dim mismatch must null the array")
    // a NULL ELEMENT inside the embedding also nulls the whole array
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS e")
    val nulled = withNullElem.select(
      graft.functions.IvfCells.cells(col("e"), codebook).as("c"))
      .collect()(0)
    assert(nulled.isNullAt(0), "null element must null the array")
    // VALUE equality across separately-collected codebooks — the
    // canonicalized-plan matching (cache sharing, ReuseExchange)
    // contract the old typedlit form had (r15 advice)
    val cb2 = Array((7L, Array(250000L, -1500000L)), (9L, Array(0L, 333333L)))
    val child = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq(1.0f, 2.0f),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, false))
    val e1 = graft.functions.IvfCells(child,
      codebook.map(_._1).toIndexedSeq,
      codebook.map(_._2.toIndexedSeq).toIndexedSeq)
    val e2 = graft.functions.IvfCells(child,
      cb2.map(_._1).toIndexedSeq,
      cb2.map(_._2.toIndexedSeq).toIndexedSeq)
    assert(e1 == e2, "separately-built identical codebooks must compare equal")
  }

  test("d_edit_dup: variant join is an equi-join, never a cartesian " +
    "or nested loop") {
    val p = plan(SparkEntry.queries("d_edit_dup")(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"edit-dup candidates must equi-join on the variant string:\n$p")
  }

  test("d_incr_edit: the standing index feeds the probe join from the " +
    "materialized artifact, batch side filtered at the scan") {
    val df = SparkEntry.queries("d_incr_edit")(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // only the BATCH is re-keyed at query time: the probe side's
    // parquet scan must push the carve predicate
    val f = formatted(df)
    assert(f.contains("PushedFilters"), f)
  }

  test("d_split_safe: the cluster map joins broadcast — the corpus is " +
    "never shuffled for the split") {
    val p = plan(SparkEntry.queries("d_split_safe")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"map join should broadcast the corpus-sparse cluster map:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus shuffle for a map-sized dim:\n$p")
  }

  test("t_sample_weighted: scalar total broadcasts; the keep test is " +
    "map-only after one aggregate") {
    val p = plan(SparkEntry.queries("t_sample_weighted")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"the 1-row total must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), "no window — the draw is per-row")
  }

  private implicit class SubstrAfter(private val s: String) {
    def substringAfter(sep: String): String = {
      val i = s.indexOf(sep)
      if (i < 0) s else s.substring(i + sep.length)
    }
  }
}
