package graft.tools

import java.nio.file.{Files, Paths}

/** Optimization-round instrument: dump `.explain("formatted")` for
  * every registry query (or an explicit subset) to one text file per
  * query, so plan-shape claims (Exchange count, join strategy,
  * PushedFilters/ReadSchema, codegen spans) are committed evidence
  * instead of prose. Plans are built, never executed — artifact-backed
  * queries may still pay a build if planning needs it (e.g. a
  * broadcast size estimate from a lake artifact), so point
  * SPARK_GRAFT_ARTIFACT_DIR at a warm root for representative plans.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [q1,q2,...]
  *
  * SPARK_GRAFT_PLAN_FINAL=1 EXECUTES each query first (via the plan's
  * own toRdd, so the dumped AdaptiveSparkPlan is the one that ran) and
  * dumps the FINAL adaptive plan (`isFinalPlan=true`) — the r20
  * verdict's ask: static dumps still show EnsureRequirements exchanges
  * that AQE elides at runtime, so "exchange-free at runtime" claims
  * need the executed plan as evidence.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val runFinal = sys.env.get("SPARK_GRAFT_PLAN_FINAL").contains("1")
    val spark = graft.Settings.fromEnv().buildSession(aqe = true)
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val qe = fn(spark, sfDir).queryExecution
          if (runFinal) {
            // run the EXACT physical plan being dumped (count()/noop
            // would wrap it in a new QueryExecution); foreach(unit)
            // materializes every partition without collecting rows
            qe.toRdd.foreach(_ => ())
          }
          val plan = qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          println(s"[plandump] $name ok")
          spark.catalog.clearCache()
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
