package graft

import org.apache.spark.sql.functions._

/** EqCount (the codegen'd F15 signature-agreement kernel) must equal
  * the higher-order-function form it replaced — including the edge
  * shapes the engine's fixed-length non-null signatures never hit
  * (length mismatch, null elements, empty arrays), so the kernel is
  * a drop-in for ANY caller, not just the current one.
  */
class EqCountSpec extends SparkSpec {

  private val zipWithForm =
    expr("""aggregate(zip_with(a, b,
           |  (x, y) -> IF(x = y, 1L, 0L)), 0L, (acc, v) -> acc + v)"""
      .stripMargin)

  test("EqCount equals the zip_with/aggregate form on edge shapes") {
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("a", "x", "c")),        // partial agree
      (Seq("a", "b"), Seq("a", "b")),                  // full agree
      (Seq("a", "b", "c"), Seq("a", "b")),             // length mismatch
      (Seq("a"), Seq("x", "a")),                       // mismatch + offset
      (Seq.empty[String], Seq("a")),                   // empty side
      (Seq.empty[String], Seq.empty[String]),          // both empty
      (Seq(null, "b"), Seq(null, "b")),                // null elements
      (Seq("a", null), Seq("a", "x")))                 // null vs value
    val df = spark.createDataFrame(rows).toDF("a", "b")
      .select(zipWithForm.as("want"),
        graft.functions.EqCount.count(col("a"), col("b")).as("got"))
    val bad = df.filter(col("want") =!= col("got")).count()
    assert(bad == 0, df.collect().mkString("; "))
  }

  test("EqCount on minhash-shaped md5 signatures matches per-seed agreement") {
    val sigA = (0 until 16).map(i => s"%032x".format(i))
    val sigB = sigA.updated(3, "ff" * 16).updated(11, "ee" * 16)
    val df = spark.createDataFrame(Seq((sigA, sigB))).toDF("a", "b")
      .select(graft.functions.EqCount.count(col("a"), col("b")).as("got"))
    assert(df.head().getLong(0) == 14L)
  }
}
