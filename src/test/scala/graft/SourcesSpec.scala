package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Format independence: the same operator plans over JSON-lines and
  * CSV copies of the events table produce row-identical results to
  * the parquet original — sources are an input detail, not an
  * operator concern.
  */
class SourcesSpec extends SparkSpec {

  private lazy val (jsonDir, csvDir): (String, String) = {
    val j = Files.createTempDirectory("graft_src_json").toString
    val c = Files.createTempDirectory("graft_src_csv").toString
    val events = Tables.events(spark, sf)
    // default text-format writers truncate timestamps to millis;
    // events.ts carries microseconds — write them out in full
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.coalesce(1).write.mode("overwrite")
      .option("timestampFormat", tsFmt).json(s"$j/events")
    events.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsFmt).csv(s"$c/events")
    (j, c)
  }

  private def factsOf(df: org.apache.spark.sql.DataFrame) =
    graft.operators.Star.factProjection(df)

  test("star facts from JSON lines equal the parquet-derived facts") {
    val schema = Tables.events(spark, sf).schema
    val viaJson = factsOf(
      Sources.jsonLines(spark, s"$jsonDir/events", schema))
    val viaParquet = factsOf(Tables.events(spark, sf))
    assert(viaJson.count() === viaParquet.count())
    assert(viaJson.except(viaParquet).count() === 0)
    assert(viaParquet.except(viaJson).count() === 0)
  }

  test("star facts from CSV equal the parquet-derived facts") {
    val schema = Tables.events(spark, sf).schema
    val viaCsv = factsOf(
      Sources.csv(spark, s"$csvDir/events", schema))
    val viaParquet = factsOf(Tables.events(spark, sf))
    assert(viaCsv.count() === viaParquet.count())
    assert(viaCsv.except(viaParquet).count() === 0)
    assert(viaParquet.except(viaCsv).count() === 0)
  }

  test("star facts from ORC equal the parquet-derived facts, with " +
    "pushdown reaching the ORC scan") {
    val dir = Files.createTempDirectory("graft_src_orc").toString + "/events"
    val events = Tables.events(spark, sf)
    events.coalesce(1).write.mode("overwrite").orc(dir)
    val viaOrc = factsOf(Sources.orc(spark, dir, events.schema))
    val viaParquet = factsOf(events)
    assert(viaOrc.count() === viaParquet.count())
    assert(viaOrc.except(viaParquet).count() === 0)
    assert(viaParquet.except(viaOrc).count() === 0)
    // the format is a detail, not a capability cliff: filters still
    // push into the ORC scan
    val f = Sources.orc(spark, dir, events.schema)
      .filter(col("user_id") === 42L).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = f.linesIterator
      .find(_.trim.startsWith("PushedFilters")).getOrElse("")
    assert(pushed.contains("user_id"),
      s"filter did not push into the ORC scan:\n$f")
  }

  test("bucketed co-located join: no shuffle, no sort, same rows") {
    val base = Files.createTempDirectory("graft_bucketed").toString
    val events = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    val custs = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Sources.writeBucketed(events, "b_events", s"$base/events",
      "user_id", 4)
    Sources.writeBucketed(custs, "b_custs", s"$base/custs",
      "user_id", 4)
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: the point is that the BUCKETS, not a
    // broadcast, remove the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_events")
        .join(spark.table("b_custs"), "user_id")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(joined.count() ===
        events.join(custs, "user_id").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_events")
      spark.sql("DROP TABLE IF EXISTS b_custs")
      ()
    }
  }

  test("date-partitioned layout: a date filter prunes whole partitions") {
    val dir = Files.createTempDirectory("graft_datepart").toString + "/ev"
    Sources.writeDatePartitioned(Tables.events(spark, sf), dir, "ts")
    val read = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-15")
    // the predicate must land in the scan's PartitionFilters (directory
    // elimination), NOT in a post-scan Filter over the full table
    val f = read.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = f.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_date"),
      s"date predicate did not become a partition filter:\n$f")
    // and the pruned read still returns exactly that day's rows
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-15").count()
    assert(read.count() === expected && expected > 0)
  }

  test("schema evolution: a column added mid-corpus merges into the " +
    "read, old rows null-fill, pruning still holds") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    // era 1: the table before the new column existed
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    // era 2: the writer gained a column
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v", "extra")
      .write.mode("append").parquet(dir)
    val df = Sources.parquetMerged(spark, dir)
    assert(df.columns.sorted.toSeq === Seq("extra", "id", "v"))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val ex = rows.map(r =>
      if (r.isNullAt(r.fieldIndex("extra"))) -1L
      else r.getLong(r.fieldIndex("extra")))
    assert(ex.toSeq === Seq(-1L, -1L, 30L, 40L),
      "pre-evolution rows must null-fill the new column")
    // evolution must not cost pruning: a 1-column projection still
    // reads a 1-column schema
    val f = df.select("id").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val rs = f.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(rs.contains("id") && !rs.contains("extra") && !rs.contains("v"),
      s"merged-schema read did not prune columns:\n$f")
  }

  test("q_heatmap_daily served off the date-partitioned lake layout: " +
    "the day predicate prunes whole fact partitions") {
    val dir = Files.createTempDirectory("graft_lake_fact").toString + "/fact"
    // land the denormalized report rows the way a 100 TB pipeline
    // would: one directory per event date (C15's hottest predicate)
    val report = graft.operators.Star.enrich(Tables.events(spark, sf))
      .filter(col("reported_id").isNotNull)
      .select("event_id", "ts", "region_id", "reported_id", "manual_detect")
    Sources.writeDatePartitioned(report, dir, "ts")
    val day = report.groupBy(to_date(col("ts")).as("d")).count()
      .orderBy(desc("count"), asc("d")).head().getDate(0)
    val read = spark.read.parquet(dir)
      .filter(col("event_date") === day)
      .groupBy(col("event_date"), col("region_id"))
      .agg(count(lit(1)).as("n_reports"),
        countDistinct("reported_id").as("n_reported"),
        sum("manual_detect").as("n_manual"))
    val f = read.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = f.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_date"),
      s"day predicate did not become a partition filter:\n$f")
    // the pruned panel equals the full C15 query restricted to the day
    val full = SparkEntry.queries("q_heatmap_daily")(spark, sf)
      .filter(to_date(col("day")) === day)
      .select(to_date(col("day")).as("event_date"), col("region_id"),
        col("n_reports"), col("n_reported"), col("n_manual"))
    assert(read.count() > 0)
    assert(read.exceptAll(full).isEmpty && full.exceptAll(read).isEmpty,
      "lake-served daily heatmap must equal the in-memory C15 panel")
  }

  test("streaming star pipe runs off the JSON-lines source") {
    val out = Files.createTempDirectory("graft_src_out").toString
    val ck = Files.createTempDirectory("graft_src_ck").toString
    val schema = Tables.events(spark, sf).schema
    val q = graft.streaming.ReportStream.pipelineStar(
      Sources.jsonLinesStream(spark, s"$jsonDir/events", schema), out, ck)
    q.awaitTermination(120000)
    q.stop()
    val streamed = spark.read.parquet(s"$out/fact_report")
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") =!= "error").count()
    assert(streamed.count() === expected)
  }
}
