package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.TopK

/** The per-key top-k whole-operator (plans/TopK.scala): results must
  * be row-identical to the window form it rewrites, and the executed
  * plan must actually BE the heap operator — no WindowExec, no sort
  * of the input, partial phase below the exchange.
  */
class TopKPlanSpec extends SparkSpec {

  TopK.enable(spark)

  private def events: DataFrame =
    Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value")

  /** The vanilla window spelling of per-key top-k (no marker). Under
    * the default `generic` rewrite mode this ALSO plans the heap
    * operator, so ground truth runs it under [[withMode]]("off").
    */
  private def windowForm(k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Evaluate `body` (collects included) under a rewrite mode — the
    * rule reads the conf at optimization time, so wrapping the action
    * is enough.
    */
  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set("spark.graft.topk.rewrite", mode)
    try body finally spark.conf.unset("spark.graft.topk.rewrite")
  }

  private def sortedRows(df: DataFrame) =
    df.orderBy("user_id", "event_id").collect().toSeq

  /** Ground-truth rows from Spark's own sort+window+filter plan. */
  private def windowRows(k: Int) =
    withMode("off")(sortedRows(windowForm(k)))

  test("perKey(k=3) ≡ the row_number window form, row for row") {
    val got = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id")), 3)
    assert(sortedRows(got) === windowRows(3))
  }

  test("k=1 (the upsert-latest shape) and k larger than any group") {
    val one = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id")), 1)
    assert(sortedRows(one) === windowRows(1))
    // k beyond every group size: top-k must be the identity
    val all = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id")), 1000000)
    assert(all.count() === events.count())
  }

  test("empty input yields empty output") {
    val none = TopK.perKey(events.filter(col("user_id") < 0),
      Seq(col("user_id")), Seq(col("value").desc, col("event_id")), 3)
    assert(none.count() === 0)
  }

  /** Executed plan, FINAL adaptive section only (AQE's toString also
    * prints the initial plan — counting nodes across both would
    * double everything).
    */
  private def finalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head

  test("plan: heap operator replaces sort+window+filter, partial " +
    "below the exchange") {
    val df = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id")), 3)
    df.collect() // finalize any adaptive planning before reading it
    val p = finalPlan(df)
    assert(p.contains("PerKeyTopK"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window"), s"WindowExec survived the rewrite:\n$p")
    assert(!p.contains("Sort "), s"the input must never be sorted:\n$p")
    // two phases: partial (map-side) + final, exchange between them
    assert(p.linesIterator.count(_.contains("PerKeyTopK")) === 2,
      s"expected partial+final pair:\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      s"final phase must cluster on the keys:\n$p")
  }

  test("co-partitioned child: no extra exchange above the existing one") {
    val pre = events.repartition(col("user_id"))
    val df = TopK.perKey(pre, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id")), 3)
    df.collect()
    val p = finalPlan(df)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"the repartition's exchange must be reused, not doubled:\n$p")
  }

  test("partial-phase flush (skew guard): a tiny flushKeys cap still " +
    "yields exact results") {
    // force the partial phase to flush every 2 distinct keys — the
    // emitted superset must still reduce to the exact per-key top-k
    spark.conf.set("spark.graft.topk.flushKeys", "2")
    try {
      val got = TopK.perKey(events, Seq(col("user_id")),
        Seq(col("value").desc, col("event_id")), 3)
      got.collect() // plan under the tiny cap
      val p = finalPlan(got)
      assert(p.contains("PerKeyTopK"), s"rewrite did not fire:\n$p")
      assert(sortedRows(got) === windowRows(3))
    } finally spark.conf.unset("spark.graft.topk.flushKeys")
  }

  test("randomized: perKey ≡ model sort-take over arbitrary data") {
    import scala.util.Random
    import spark.implicits._
    val rnd = new Random(1234)
    for (trial <- 1 to 3) {
      val k = 1 + rnd.nextInt(4)
      val rows = List.fill(500 + rnd.nextInt(500))(
        (rnd.nextInt(40).toLong, rnd.nextLong(), rnd.nextInt(50).toLong))
      val df = rows.toDF("key", "id", "score").repartition(7)
      val got = TopK.perKey(df, Seq(col("key")),
        Seq(col("score").desc, col("id")), k)
        .as[(Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).values.flatMap(g =>
        g.sortBy(t => (-t._3, t._2)).take(k)).toSet
      assert(got === want, s"trial $trial (k=$k)")
    }
  }

  test("null group keys form one group, exactly as the window form") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = List.fill(400)((rnd.nextInt(10).toLong, rnd.nextLong(),
      rnd.nextInt(30).toLong))
    val df = rows.toDF("key0", "id", "score")
      .withColumn("key", when(col("key0") % 5 === 0, lit(null))
        .otherwise(col("key0")))
      .drop("key0").repartition(5)
    val got = TopK.perKey(df, Seq(col("key")),
      Seq(col("score").desc, col("id")), 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assert(got.orderBy("id").collect().toSeq ===
      withMode("off")(want.orderBy("id").collect().toSeq))
  }

  test("streaming leaderboard twin: two-batch replay converges on the " +
    "batch operator's rows, with k-bounded state") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.ReportStream
    val in = Files.createTempDirectory("graft_topk_stream").toString
    // two files ⇒ two micro-batches: the leaderboard must converge to
    // the same top-3 whether rows arrived together or split
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$in/e1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$in/e2.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val src = ReportStream.fileSource(spark, in,
      Tables.eventsRaw(spark, sf))
    val q = ReportStream.streamingLeaderboard(src, 3)
      .writeStream.format("memory").queryName("graft_leaderboard")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()
    import spark.implicits._
    val emitted = spark.table("graft_leaderboard")
      .as[ReportStream.LeaderRow].collect()
    // latest emission per key = the row with that key's max version
    val fin = emitted.groupBy(_.userId).map { case (_, rs) =>
      rs.maxBy(_.version) }.toSeq
    assert(fin.forall(_.top.size <= 3), "state must stay k-bounded")
    val want = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id")), 3)
      .as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).map { case (uid, rs) =>
        uid -> rs.sortBy(t => (-t._4, t._2))
          .map(t => ReportStream.TopEntry(t._4, t._2, t._3)).toSeq }
    val got = fin.map(r => r.userId -> r.top).toMap
    assert(got === want,
      "streamed top-k must equal the batch operator per key")
  }

  test("GENERIC rewrite: a vanilla sort+window+filter query (no " +
    "marker, no graft API) plans PerKeyTopKExec and matches the " +
    "window rows") {
    val df = windowForm(3) // plain "rn" column — zero opt-in
    val rows = sortedRows(df)
    val p = finalPlan(df)
    assert(p.contains("PerKeyTopK"),
      s"generic rank-limit pattern must rewrite by default:\n$p")
    assert(!p.contains("Window"), s"WindowExec survived:\n$p")
    assert(rows === windowRows(3))
  }

  test("mode=marker narrows the rewrite back to the opt-in column; " +
    "mode=off disables even the marker") {
    withMode("marker") {
      val vanilla = windowForm(3)
      vanilla.collect()
      assert(!finalPlan(vanilla).contains("PerKeyTopK"),
        "marker mode must leave non-marker rank filters on their " +
          "window plan")
      val marked = TopK.perKey(events, Seq(col("user_id")),
        Seq(col("value").desc, col("event_id")), 3)
      marked.collect()
      assert(finalPlan(marked).contains("PerKeyTopK"),
        "the marker is the explicit opt-in — it rewrites in marker mode")
    }
    withMode("off") {
      val marked = TopK.perKey(events, Seq(col("user_id")),
        Seq(col("value").desc, col("event_id")), 3)
      marked.collect()
      assert(!finalPlan(marked).contains("PerKeyTopK"),
        "off must disable the rewrite entirely")
    }
  }

  /** The rank() (tie-aware) window spelling. */
  private def rankForm(k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(floor(col("value") / 100).desc_nulls_last)
    events.withColumn("rk", rank().over(w))
      .filter(col("rk") <= k).drop("rk")
  }

  test("rank() <= k rewrites to the tie-retaining heap and matches " +
    "the window plan row for row — boundary tie groups kept whole") {
    val df = rankForm(2)
    val rows = sortedRows(df)
    val p = finalPlan(df)
    assert(p.contains("PerKeyTopK"),
      s"the rank() pattern must rewrite too:\n$p")
    assert(!p.contains("Window"), s"WindowExec survived:\n$p")
    val want = withMode("off")(sortedRows(rankForm(2)))
    assert(rows === want)
    // the contract differs from row_number's: floor(value) buckets tie
    // heavily, so rank() <= 2 must keep MORE rows than row_number <= 2
    val rnRows = withMode("off") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(floor(col("value") / 100).desc_nulls_last, col("event_id"))
      events.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn").count()
    }
    assert(rows.size > rnRows,
      "ties must be retained beyond the k-th row — otherwise this " +
        "test exercises nothing")
  }

  test("randomized: rank() <= k heap ≡ model rank filter over " +
    "arbitrary tie-heavy data") {
    import scala.util.Random
    import spark.implicits._
    val rnd = new Random(4321)
    for (trial <- 1 to 3) {
      val k = 1 + rnd.nextInt(3)
      // scores drawn from just 5 values: every group has boundary ties
      val rows = List.fill(400 + rnd.nextInt(300))(
        (rnd.nextInt(30).toLong, rnd.nextLong(), rnd.nextInt(5).toLong))
      val df = rows.toDF("key", "id", "score").repartition(7)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("score").desc)
      val got = df.withColumn("rk", rank().over(w))
        .filter(col("rk") <= k).drop("rk")
        .as[(Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).values.flatMap { g =>
        g.filter(t => g.count(o => o._3 > t._3) < k)
      }.toSet
      assert(got === want, s"trial $trial (k=$k)")
    }
  }

  /** The dense_rank() (k distinct value groups) spelling. */
  private def denseForm(k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(floor(col("value") / 100).desc_nulls_last)
    events.withColumn("dr", dense_rank().over(w))
      .filter(col("dr") <= k).drop("dr")
  }

  test("dense_rank() <= k rewrites to the distinct-group heap and " +
    "matches the window plan; dense keeps >= rank keeps >= " +
    "row_number keeps on the same buckets") {
    val df = denseForm(2)
    val rows = sortedRows(df)
    val p = finalPlan(df)
    assert(p.contains("PerKeyTopK"),
      s"the dense_rank() pattern must rewrite too:\n$p")
    assert(!p.contains("Window"), s"WindowExec survived:\n$p")
    assert(rows === withMode("off")(sortedRows(denseForm(2))))
    val rankKeeps = withMode("off")(rankForm(2).count())
    assert(rows.size >= rankKeeps,
      "dense_rank <= k retains whole value groups — never fewer " +
        "rows than rank <= k")
  }

  test("partial-phase flush under rank and dense modes: tiny " +
    "flushKeys segments still reduce to the exact tie-aware results") {
    // partial segments emit SUPERSETS; the final phase must re-apply
    // each mode's own boundary contract exactly
    spark.conf.set("spark.graft.topk.flushKeys", "2")
    try {
      val rk = sortedRows(rankForm(2))
      val dn = sortedRows(denseForm(2))
      assert(rk === withMode("off")(sortedRows(rankForm(2))))
      assert(dn === withMode("off")(sortedRows(denseForm(2))))
    } finally spark.conf.unset("spark.graft.topk.flushKeys")
  }

  test("randomized: dense_rank() <= k heap ≡ model distinct-value " +
    "filter over tie-heavy data") {
    import scala.util.Random
    import spark.implicits._
    val rnd = new Random(8765)
    for (trial <- 1 to 3) {
      val k = 1 + rnd.nextInt(3)
      val rows = List.fill(400 + rnd.nextInt(300))(
        (rnd.nextInt(30).toLong, rnd.nextLong(), rnd.nextInt(6).toLong))
      val df = rows.toDF("key", "id", "score").repartition(7)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("score").desc)
      val got = df.withColumn("dr", dense_rank().over(w))
        .filter(col("dr") <= k).drop("dr")
        .as[(Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).values.flatMap { g =>
        val topVals = g.map(_._3).distinct.sorted(Ordering[Long].reverse)
          .take(k).toSet
        g.filter(t => topVals(t._3))
      }.toSet
      assert(got === want, s"trial $trial (k=$k)")
    }
  }

  test("rank column KEPT in the output is never rewritten (the rank " +
    "itself is demanded — only a real window can produce it)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val df = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3) // no .drop("rn")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("PerKeyTopK"),
      s"a demanded rank column must keep its window plan:\n$p")
    assert(df.columns.contains("rn"))
  }
}
