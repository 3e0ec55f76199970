package graft

/** Driver benchmark: one JSON line with per-query seconds.
  * Dev knobs: SPARK_GRAFT_QUERIES=a,b,c to subset,
  * SPARK_GRAFT_REPEAT=N to repeat each query (min time reported).
  */
object Bench {

  /** Calibration canary pin (r16 verdict #3): the canary's wall
    * seconds on the reference host at pin time. Every bench emits
    * `host_factor` = canary / pin, so a uniformly drifted map is
    * adjudicated by ARITHMETIC (compare drift-normalized seconds
    * `t / host_factor` against the pins) instead of a worktree A/B
    * re-run of the pin commit — three rounds re-adjudicated the same
    * minhash lines by hand before this. Re-pin deliberately when the
    * canary itself changes, never to absorb host noise.
    */
  val CanaryPin = 0.94 // min-of-3, pinned r17 (0.942/1.007/0.942 across 3 JVMs)

  /** Fixed synthetic pure-compute workload: the sorted-merge
    * intersect kernel over a GENERATED pair relation — no artifacts,
    * no parquet, no shuffle beyond one map-side agg, plan pinned by
    * construction, so its wall time moves with the HOST (CPU clocks,
    * noisy neighbors), not with the engine's code or data. 30M rows ×
    * two 64-long sorted arrays ≈ 3.8G merge steps through the same
    * codegen'd expression the minhash family hot path uses.
    */
  def canary(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(30000000)
        .select(graft.functions.SortedIntersectCount.count(
          sequence(col("id") % 50, col("id") % 50 + 63),
          sequence(col("id") % 37, col("id") % 37 + 63)).as("c"))
        .agg(sum("c")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    runs.min
  }

  /** Cumulative hypervisor-steal seconds from /proc/stat (col 8 of the
    * aggregate cpu line, USER_HZ=100 ticks). Recorded at leg start and
    * end and emitted as `steal_s` in the headline (r20 verdict #6):
    * the pure-CPU canary reads host SPEED but cannot distinguish a
    * calm slow host from a steal storm mid-leg — with the delta in the
    * artifact, a storm leg is machine-detectable without forensics.
    * Returns NaN off Linux; emission degrades to null.
    */
  private def stealSeconds(): Double =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      cpu(8).toDouble / 100.0
    } catch { case _: Throwable => Double.NaN }

  def main(args: Array[String]): Unit = {
    val stealStart = stealSeconds()
    val settings = Settings.fromEnv()
    val sfDir = settings.sfDir
    val repeat = settings.repeat
    val only = settings.queries
    val spark = settings.buildSession(aqe = true)
    // per-query scale instrument (r15 verdict #2): the max shuffle-read
    // ROWS any single task consumed while the query ran — the quantity
    // that walls at 100 TB (a window or hot bucket funnels a whole
    // partition into one task; a bounded plan's max tracks the advisory
    // partition size). Emitted beside seconds in the full map so the
    // next window-wall-shaped regression self-reports in the closing
    // artifact instead of waiting for a judge skew probe.
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    // RAM instruments beside the skew one (r16 verdict #7): total
    // bytes a query spilled (memory+disk estimates summed over tasks
    // — the "did the 128 GiB sandbox hide a cliff" signal) and the
    // single-task peak execution memory (what one real executor slot
    // must provision)
    val spillSum = new java.util.concurrent.atomic.AtomicLong(0)
    val peakMem = new java.util.concurrent.atomic.AtomicLong(0)
    // task count beside the RAM columns (r17 verdict #8): AQE
    // coalescing under window contention changes per-task build sizes,
    // which made peak_task_mem read 5x apart between same-code legs
    // (d_minhash_est 56.7 vs 291.6 MB). Recording how many tasks the
    // query actually ran makes a RAM delta self-explaining: fewer
    // tasks => bigger per-task builds, same total.
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
    // total shuffle WRITE bytes (r18): the quantity that walls a
    // SINGLE BOX at big SFs (the sf10 fat-verify lesson: a linear-
    // in-corpus shuffle with a large constant exceeds local disk
    // long before CPU matters). Emitted per query so the decade
    // table's byte-mass exponents are measured, not argued.
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          taskCount.incrementAndGet()
          if (m != null) {
            val rows = m.shuffleReadMetrics.recordsRead
            var cur = maxTask.get()
            while (rows > cur && !maxTask.compareAndSet(cur, rows))
              cur = maxTask.get()
            spillSum.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            val pk = m.peakExecutionMemory
            var pc = peakMem.get()
            while (pk > pc && !peakMem.compareAndSet(pc, pk))
              pc = peakMem.get()
          }
        }
      })
    // untimed warmup: pay JVM/codegen/parquet-footer init once here,
    // not inside whichever query happens to run first (measured ~3s
    // of first-query inflation without this)
    graft.Tables.events(spark, sfDir).groupBy("event_type").count().count()
    graft.Tables.documents(spark, sfDir).limit(1).count()
    // host calibration BEFORE any timed query (after warmup so the
    // canary itself is not paying JVM init)
    val canarySec = canary(spark)
    val hostFactor = canarySec / CanaryPin
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    if (selected.contains("d_incr_clusters")) {
      // d_incr_clusters pins cluster-map MAINTENANCE — the cost a
      // deployment pays per ingest batch. Its two inputs (the standing
      // 80%-carve map and the simulated batch edges) are lake-resident
      // artifacts in production, so their build is warmup, not
      // workload (r11 verdict adjudication of the 2× closing line).
      // try/catch: a failed warmup (r18: the sf10 leg filled /tmp
      // building the cluster map) must surface as THAT query's err,
      // never kill the whole leg — the timed pass below repeats the
      // build attempt and records the failure per-query.
      try {
        graft.operators.Dedup.oldClusterMap(spark, sfDir).count()
        graft.operators.Dedup.batchEdges(spark, sfDir).count()
      } catch { case e: Throwable =>
        System.err.println(s"BENCH WARN d_incr_clusters warmup failed: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    // A query that throws must surface as "err", never as a timing:
    // timing a crash reads as a fake speedup and corrupts the 2× gate.
    // per-query artifact attribution (r12 verdict): any build/load a
    // query pays is recorded next to its timing, so an inflated line
    // is self-explaining from the artifact alone
    val artEvents = scala.collection.mutable.Map.empty[String, Seq[String]]
    val artMillis = scala.collection.mutable.Map.empty[String, Long]
    val maxTaskRows = scala.collection.mutable.Map.empty[String, Long]
    val spillBytes = scala.collection.mutable.Map.empty[String, Long]
    val peakTaskMem = scala.collection.mutable.Map.empty[String, Long]
    val nTasks = scala.collection.mutable.Map.empty[String, Long]
    val shufBytes = scala.collection.mutable.Map.empty[String, Long]
    // best artifact-ADJUSTED time per query: each repeat subtracts its
    // OWN artifact millis before the min (r19 advice: with REPEAT>=2
    // the cold rep pays the build while the warm rep supplies the min,
    // so subtracting the cross-rep artifact total from the min dt
    // deflated norm — sometimes below zero — and genuine 2x breaches
    // on artifact-backed queries could never flag)
    val adjBest = scala.collection.mutable.Map.empty[String, Double]
    def runOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, reps: Int): Either[String, Double] = {
      // deterministic listener drain (not a sleep): task-end events
      // from the PREVIOUS query must not bleed into this one's max
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      maxTask.set(0)
      spillSum.set(0)
      peakMem.set(0)
      taskCount.set(0)
      shufWrite.set(0)
      val times = (1 to reps).map { _ =>
        val ev0 = Artifacts.buildEvents.size
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"BENCH ERR $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
                   false }
        val dt = (System.nanoTime() - t0) / 1e9
        val paidEvents = Artifacts.buildEvents.drop(ev0)
        val paid = paidEvents.map(e => s"${e.family}:${e.kind}:" +
          s"${e.millis}ms${if (e.nested) "~nested" else ""}")
        // top-level events only: a nested event's wall is contained
        // in its outer's — summing both double-subtracts and masked a
        // real 4x d_semdedup pin breach (r20)
        val repArtMs = paidEvents.filterNot(_.nested).map(_.millis).sum
        if (paid.nonEmpty) {
          artEvents(name) = artEvents.getOrElse(name, Nil) ++ paid
          artMillis(name) = artMillis.getOrElse(name, 0L) + repArtMs
        }
        // isolate queries: drop caches a query built so the next
        // query's time is its own (and GC pressure stays flat)
        spark.catalog.clearCache()
        if (ok) Some((dt, repArtMs)) else None
      }
      val done = times.flatten
      if (done.nonEmpty)
        adjBest(name) = done.map { case (dt, art) => dt - art / 1e3 }.min
      val best = done.map(_._1)
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      // max over the repeats (the conservative bound: a warm repeat
      // that loads an artifact instead of building it reads fewer
      // rows; the plan's worst observed task is what scales)
      maxTaskRows(name) = maxTask.get()
      spillBytes(name) = spillSum.get()
      peakTaskMem(name) = peakMem.get()
      nTasks(name) = taskCount.get()
      shufBytes(name) = shufWrite.get()
      if (best.isEmpty) Left("err") else Right(best.min)
    }
    val results: Seq[(String, Either[String, Double])] =
      selected.toSeq.map { case (name, fn) => name -> runOne(name, fn, repeat) }
    // SELF-ADJUDICATING DRIFT PASS (r17 verdict #1): the REPEAT=1
    // driver map carried 7 phantom >=2x lines last round that the
    // same-code REPEAT=2 closing map disproved — a full adjudication
    // cycle per round. Here the bench adjudicates itself: any line
    // whose drift-normalized time (t / host_factor) breaches 2x its
    // committed pin by a non-trivial margin gets ONE warm re-run, and
    // both timings are emitted side by side. A transient (JIT, page
    // cache, window contention) reads clean on the second shot; a
    // real regression reads hot twice and is worth the human look.
    // pins were taken at sf0.1 — the suspect rule is meaningless at
    // other scale factors (sf1 legs would flag everything).
    // Artifact-build time is SUBTRACTED before the pin compare (r18
    // advice): pins come from warm artifact-loaded runs, so a REPEAT=1
    // leg's first-shot build (recorded in artEvents with its own
    // millis) would otherwise breach 2x on every run by construction —
    // systematic rerun cost and phantom drift noise, not a regression
    // signal. The query's OWN work still faces the full 2x gate.
    // Each repeat subtracts its OWN artifact millis before the min
    // (adjBest, r19 advice) — the cross-rep total against the min dt
    // under-counted warm reps and could read negative.
    // Absolute floor 0.5 s (r19 verdict #5): the r19 driver leg left
    // 7 sub-second lines reading 2.05-2.34x their 0.21-0.28 s pins
    // even after a clean warm re-run — fixed ~0.3 s one-shot session
    // overhead (JIT + first-use codegen per query family), not drift.
    // A breach must be BOTH >=2x AND >=0.5 s over pin to flag; below
    // that the delta is within a loaded one-JVM's per-query noise
    // floor and a REPEAT=2 closing map reads zero suspects anyway.
    val pinsApply = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    val suspects: Seq[(String, Double, Double, Double)] =
      results.collect {
        case (name, Right(t))
            if pinsApply && BenchPins.pins.get(name).exists { pin =>
              val norm = adjBest.getOrElse(name, t) / hostFactor
              norm >= 2 * pin && norm - pin >= 0.5
            } =>
          val pin = BenchPins.pins(name)
          val second = runOne(name + "#2", selected(name), 1) match {
            case Right(t2) => t2
            case Left(_)   => Double.NaN
          }
          (name, t, second, pin)
      }
    // Self-contained artifact FIRST: the full per-query map (ms
    // resolution) goes to a file in the repo, so no timing ever
    // depends on the driver's tty-tail capture surviving (r10 lost 40
    // of 115 chunked timings to tail truncation). Overwritten per run;
    // committed alongside the round's work.
    val fullEntries = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + (math.round(v * 1000) / 1000.0)
      case (k, Left(_))  => s"\"" + k + "\":\"err\""
    }
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val timed = results.collect { case (_, Right(v)) => v }
    val errs = results.collect { case (k, Left(_)) => s"\"$k\"" }
    val total = timed.sum
    val artJson = artEvents.toSeq.sortBy(_._1).map { case (q, evs) =>
      s"\"$q\":[${evs.map(e => s"\"$e\"").mkString(",")}]"
    }.mkString("{", ",", "}")
    val mtrJson = results.map { case (k, _) =>
      s"\"$k\":${maxTaskRows.getOrElse(k, 0L)}"
    }.mkString("{", ",", "}")
    // spill/peak maps stay sparse: zero rows (the overwhelming norm at
    // these SFs) are elided so the closing artifact highlights the
    // exceptions instead of burying them
    val spillJson = results.collect {
      case (k, _) if spillBytes.getOrElse(k, 0L) > 0 =>
        s"\"$k\":${spillBytes(k)}"
    }.mkString("{", ",", "}")
    val peakJson = results.map { case (k, _) =>
      s"\"$k\":${peakTaskMem.getOrElse(k, 0L)}"
    }.mkString("{", ",", "}")
    val tasksJson = results.map { case (k, _) =>
      s"\"$k\":${nTasks.getOrElse(k, 0L)}"
    }.mkString("{", ",", "}")
    val shufJson = results.map { case (k, _) =>
      s"\"$k\":${shufBytes.getOrElse(k, 0L)}"
    }.mkString("{", ",", "}")
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    val suspJson = suspects.map { case (name, first, second, pin) =>
      val arts = artEvents.getOrElse(name + "#2", Nil)
      val secondStr = if (second.isNaN) "\"err\"" else r3(second).toString
      s""""$name":{"first":${r3(first)},"second":$secondStr,"pin":$pin,"norm_first":${r3(first / hostFactor)},"norm_second":${if (second.isNaN) "null" else r3(second / hostFactor).toString},"rerun_artifacts":[${arts.map(e => s"\"$e\"").mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val stealEnd = stealSeconds()
    val stealJson =
      if (stealStart.isNaN || stealEnd.isNaN) "null"
      else (math.round((stealEnd - stealStart) * 100) / 100.0).toString
    val calJson = s""""canary_sec":${math.round(canarySec * 1000) / 1000.0},"canary_pin":$CanaryPin,"host_factor":${math.round(hostFactor * 1000) / 1000.0},"steal_s":$stealJson"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${timed.size},"n_err":${errs.size},"errors":[${errs.mkString(",")}],"sf":"$sfDir",$calJson,"artifact_events":$artJson,"max_task_rows":$mtrJson,"spill_bytes":$spillJson,"peak_task_mem":$peakJson,"n_tasks":$tasksJson,"shuffle_write_bytes":$shufJson,"drift_suspects":$suspJson,"queries":${fullEntries.mkString("{", ",", "}")}}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullJson + "\n")
    catch { case e: Throwable => System.err.println(s"BENCH WARN: could not write $outFile: ${e.getMessage}") }
    // stdout chunks stay as a redundant channel for the driver, but at
    // CENTISECOND ints (~half the bytes of ms doubles — r10's tail
    // window clipped the first 2.5 of 10 chunks; cs resolution is far
    // below run-to-run noise and halves what the tail must hold)
    val csEntries = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + math.round(v * 100)
      case (k, Left(_))  => s"\"" + k + "\":\"err\""
    }
    csEntries.grouped(12).zipWithIndex.foreach { case (chunk, i) =>
      println(s"""{"metric":"chunk","unit":"centisec","i":$i,"queries":${chunk.mkString("{", ",", "}")}}""")
    }
    // headline carries the FULL per-query map in SECONDS (r20 verdict
    // #2: the driver's per-round comparison parsed the last centisec
    // chunk as the map — garbage — and r19's not at all). Queries-only
    // at centisecond resolution is ~4-5 KB for 176 queries, far below
    // the r9 overflow (which inlined every instrumentation map); the
    // chunks above stay as the redundant channel and the headline is
    // the LAST line, so an end-anchored tail capture always holds it.
    val secEntries = results.map {
      case (k, Right(v)) => s"\"" + k + "\":" + (math.round(v * 100) / 100.0)
      case (k, Left(_))  => s"\"" + k + "\":\"err\""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${timed.size},"n_err":${errs.size},"errors":[${errs.mkString(",")}],"sf":"$sfDir",$calJson,"n_drift_suspects":${suspects.size},"full_map":"$outFile","queries":${secEntries.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
