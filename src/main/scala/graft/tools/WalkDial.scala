package graft.tools

/** Dial runner for the G26 graph-walk quality knobs: prints the
  * walk's brute-force top-10 overlap (the G15 rung-11 recall
  * definition) and its wall time at the WalkBeam/WalkRounds the JVM
  * was started with (SPARK_GRAFT_WALK_BEAM / SPARK_GRAFT_WALK_ROUNDS)
  * — the KnnDial/A-ladder pattern applied to the walk. Dev tool; the
  * measured grid lives in BASELINE.md.
  */
object WalkDial {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Settings.fromEnv().buildSession(aqe = true)
    graft.Tables.embeddings(spark, sfDir).count()
    val brute = graft.SparkEntry.queries("s_cosine_topk")(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // graph build is amortized index cost, not walk cost — pay it
    // before the timer exactly as Bench's warmup stance does
    graft.SparkEntry.queries("s_knn_graph")(spark, sfDir).count()
    val t0 = System.nanoTime()
    val walk = graft.SparkEntry.queries("s_ann_graph_walk")(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sec = (System.nanoTime() - t0) / 1e9
    val hits = walk.intersect(brute).size
    println(s"WALKDIAL beam=${graft.operators.Similarity.WalkBeam}" +
      s" rounds=${graft.operators.Similarity.WalkRounds} sf=$sfDir" +
      s" hits=$hits recall_bp=${hits * 1000}" +
      s" walk_sec=${math.round(sec * 1000) / 1000.0}")
    spark.stop()
  }
}
