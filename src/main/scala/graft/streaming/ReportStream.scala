package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming re-expression of the reference worker's pipe
  * (ref src/main.py): Kafka consumer → asyncio queues → batcher →
  * MySQL inserter becomes readStream → declarative transform →
  * foreachBatch idempotent sink.
  *
  * In this container there is no Kafka broker, so the exercised
  * source is a file stream (same unbounded-table semantics, same
  * downstream code); `kafkaSource` shows the one-line swap for a real
  * deployment. The batch-of-1000-or-60s logic (ref main.py:39-57) is
  * the micro-batch trigger; the error-requeue loop (main.py:78-96)
  * becomes a dead-letter split written alongside the good rows.
  */
object ReportStream {

  /** The JSON payload schema (ref views/report.py ReportInQV1/V2,
    * reduced to the test events' shape). Handles the nanos-as-long ts
    * the raw parquet stream delivers.
    */
  def parsedEvents(raw: DataFrame): DataFrame =
    graft.Tables.nanosToTimestamp(raw)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("manual_detect", col("event_id") % 2)

  /** Kafka source for production (not runnable here: no broker).
    * value is the JSON body, exactly the reference's consumer feed.
    */
  def kafkaSource(spark: SparkSession, servers: String,
      topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING) AS json")

  /** File source standing in for Kafka: a directory of event parquet
    * with the same schema as the events table.
    */
  def fileSource(spark: SparkSession, dir: String,
      schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** D1: the full pipe. Valid rows land in outDir/reports, failures
    * in outDir/dead_letter with a reason (the reference requeues to
    * Kafka; a DLQ table is the lake-native equivalent).
    */
  def pipeline(events: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery = {
    val parsed = parsedEvents(events)
    parsed.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val valid = batch.filter(col("event_type") =!= "error")
        val dead = batch.filter(col("event_type") === "error")
          .withColumn("reason", lit("bad_type"))
        appendDedup(valid, s"$outDir/reports", Seq("event_id"))
        if (!dead.isEmpty)
          dead.write.mode("append").parquet(s"$outDir/dead_letter")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** D3: idempotent append — dedup within the batch AND against rows
    * already in the sink (anti join on the natural key), the
    * lake-side analog of the reference's NOT-EXISTS inserts
    * (ref report.py:170-314). Makes an at-least-once source
    * effectively exactly-once at the sink.
    */
  def appendDedup(batch: DataFrame, path: String,
      key: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val deduped = batch.dropDuplicates(key)
    val fresh =
      try {
        val existing = spark.read.parquet(path).select(key.map(col): _*)
        deduped.join(broadcast(existing.distinct()), key, "left_anti")
      } catch { case _: Exception => deduped } // first batch: no sink yet
    fresh.write.mode("append").parquet(path)
  }

  final case class Sighting(reportingId: Long, reportedId: Long,
      manualDetect: Long)
  final case class SightingSeen(reportingId: Long, reportedId: Long,
      manualDetect: Long, firstSeen: Long)

  /** D5: the reference's in-process LRU dedup cache (ref _cache.py)
    * as managed streaming state: emit a sighting only the first time
    * its key appears; state expires instead of LRU-evicting.
    */
  def firstSightings(events: Dataset[Sighting]): Dataset[SightingSeen] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(s => (s.reportingId, s.reportedId, s.manualDetect))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: (Long, Long, Long), rows: Iterator[Sighting],
            state: GroupState[Long]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val n = rows.size.toLong
            val prior = state.getOption.getOrElse(0L)
            state.update(prior + n)
            state.setTimeoutDuration("1 hour")
            if (prior == 0L && n > 0)
              Iterator(SightingSeen(key._1, key._2, key._3, n))
            else Iterator.empty
          }
        })
  }

  /** Watermarked tumbling-window counts (the reference's batch
    * accounting, ref main.py:39-57, as an always-on aggregation).
    */
  def windowedStats(events: DataFrame): DataFrame =
    graft.Tables.nanosToTimestamp(events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("decimal(18,2)")
          .as("sum_value"))
}
