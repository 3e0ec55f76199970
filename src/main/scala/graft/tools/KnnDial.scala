package graft.tools

/** Dial runner for the kNN-graph multi-assignment width: prints the
  * s_knn_recall evidence row and times s_knn_graph at the KnnAssign
  * the JVM was started with (SPARK_GRAFT_KNN_ASSIGN). Dev tool.
  */
object KnnDial {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Settings.fromEnv().buildSession(aqe = true)
    graft.Tables.embeddings(spark, sfDir).count()
    val t0 = System.nanoTime()
    val g = graft.SparkEntry.queries("s_knn_graph")(spark, sfDir).count()
    val gSec = (System.nanoTime() - t0) / 1e9
    val rec = graft.SparkEntry.queries("s_knn_recall")(spark, sfDir)
      .collect().mkString(";")
    println(s"""KNNDIAL assign=${graft.operators.Similarity.KnnAssign}""" +
      s""" sf=$sfDir graph_rows=$g graph_sec=$gSec recall=$rec""")
    spark.stop()
  }
}
