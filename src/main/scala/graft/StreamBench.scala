package graft

import java.nio.file.Files

/** End-to-end streaming throughput: drive the full star pipeline
  * (cleanse → split → fact projection → bounded idempotent sink →
  * DLQ with v2 requeue) over the events table as a file stream and
  * report rows/sec. One JSON line like Bench.
  *
  * This is the number comparable to the reference worker's
  * end-to-end rate (its generator pushes 100k Kafka messages per
  * run through parse → resolve → MySQL insert).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val settings = Settings.fromEnv()
    val sfDir = settings.sfDir
    val spark = settings.buildSession(aqe = true)

    val in = Files.createTempDirectory("graft_sb_in").toString
    val out = Files.createTempDirectory("graft_sb_out").toString
    val ck = Files.createTempDirectory("graft_sb_ck").toString
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$in/events.parquet"))

    val n = Tables.events(spark, sfDir).count()
    val t0 = System.nanoTime()
    val q = streaming.ReportStream.pipelineStar(
      streaming.ReportStream.fileSource(spark, in,
        Tables.eventsRaw(spark, sfDir)), out, ck)
    q.awaitTermination(600000)
    q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val written = spark.read.parquet(s"$out/fact_report").count()
    println(f"""{"metric":"stream_rows_per_sec","value":${n / sec}%.0f,""" +
      s""""unit":"rows/sec","rows":$n,"written":$written,""" +
      f""""sec":$sec%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
