package graft.tools

import scala.collection.mutable

/** Optimization-round instrument: run named registry queries and
  * print PER-STAGE wall/CPU/shuffle metrics (the Spark-UI stage table
  * for a UI-less sandbox), so "where does this query spend its time"
  * is a measurement instead of a guess. Timing methodology matches
  * Bench (count() action, warm repeat available via
  * SPARK_GRAFT_REPEAT); output is diagnostic only — never parsed by
  * the driver.
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> q1[,q2,...]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val settings = graft.Settings.fromEnv()
    val spark = settings.buildSession(aqe = true)

    case class St(name: String, tasks: Int, wallMs: Long, cpuMs: Long,
        runMs: Long, inBytes: Long, shufReadB: Long, shufWriteB: Long,
        maxTaskMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val taskMax = mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = if (te.taskInfo != null) te.taskInfo.duration else 0L
          taskMax.updateWith(te.stageId)(p => Some(math.max(p.getOrElse(0L), d)))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(0L)
          stages += St(i.name.take(90), i.numTasks, wall,
            if (m != null) m.executorCpuTime / 1000000 else 0L,
            if (m != null) m.executorRunTime else 0L,
            if (m != null) m.inputMetrics.bytesRead else 0L,
            if (m != null) m.shuffleReadMetrics.totalBytesRead else 0L,
            if (m != null) m.shuffleWriteMetrics.bytesWritten else 0L,
            taskMax.getOrElse(i.stageId, 0L))
        }
      })
    // warmup identical to Bench
    graft.Tables.events(spark, sfDir).groupBy("event_type").count().count()
    graft.Tables.documents(spark, sfDir).limit(1).count()
    val repeat = settings.repeat
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to repeat).foreach { rep =>
        stages.clear(); taskMax.clear()
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        spark.catalog.clearCache()
        println(f"%n=== $name rep $rep: $dt%.2f s, ${stages.size} stages ===")
        println(f"${"stage"}%-92s ${"tasks"}%5s ${"wall"}%7s ${"cpu"}%7s ${"run"}%7s ${"maxTask"}%7s ${"in"}%9s ${"sRead"}%9s ${"sWrite"}%9s")
        stages.sortBy(-_.wallMs).take(25).foreach { s =>
          println(f"${s.name}%-92s ${s.tasks}%5d ${s.wallMs}%6dms ${s.cpuMs}%6dms ${s.runMs}%6dms ${s.maxTaskMs}%6dms ${s.inBytes/1024}%8dK ${s.shufReadB/1024}%8dK ${s.shufWriteB/1024}%8dK")
        }
      }
    }
    spark.stop()
  }
}
