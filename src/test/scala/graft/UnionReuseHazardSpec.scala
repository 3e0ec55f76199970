package graft

import org.apache.spark.sql.functions._

/** The Spark 4.1.2 union/exchange-reuse hazard (r20, caught by the
  * DuckDB gate on d_chunk_dup): a UNION whose two branches end in
  * IDENTICAL co-partitioned REPARTITION_BY_NUM exchanges, consumed by
  * a window whose partition key is a SUBSET of the exchange key, can
  * compute wrong window frames on the WRITE path (collect() stays
  * correct) once exchange reuse folds the branches onto one exchange.
  * The engine's fix keeps cdcChunks' union branches differently
  * partitioned (TextAnalysis.scala cdcChunks docstring).
  *
  * Two tests: (1) the GUARD — the engine's chunker must produce
  * write-path results identical to its collect() results on a
  * constructed corpus (the exact channel the r20 incident corrupted);
  * (2) the standalone REPRODUCER of the hazardous shape on plain
  * DataFrames — informational: it reports whether the underlying
  * planner bug is still present, and passes either way (the engine
  * no longer builds this shape; when a Spark upgrade fixes it, the
  * probe reads clean with no spec churn).
  */
class UnionReuseHazardSpec extends SparkSpec {

  private def syntheticDocs = {
    import spark.implicits._
    // deterministic multi-line docs long enough for several CDC
    // boundaries each (~300 chars of md5-derived text)
    (1L to 400L).map { i =>
      val text = (0 until 10)
        .map(j => java.security.MessageDigest.getInstance("MD5")
          .digest(s"$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
        .mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
  }

  test("cdcChunks: write-path output equals collect() output (the " +
    "r20 wrong-frames channel)") {
    val chunks = graft.operators.TextAnalysis.cdcChunks(syntheticDocs)
    val viaCollect = chunks.collect().toSeq.sortBy(r =>
      (r.getLong(0), r.getLong(1)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_union_reuse").toString
    chunks.write.mode("overwrite").parquet(dir)
    val viaWrite = spark.read.parquet(dir).collect().toSeq.sortBy(r =>
      (r.getLong(0), r.getLong(1)))
    assert(viaWrite === viaCollect,
      "write path diverged from collect — the union/exchange-reuse " +
        "hazard is back in the chunker's plan shape")
  }

  test("standalone reproducer: identically-partitioned union branches " +
    "+ subset-key window, write vs collect (informational)") {
    import spark.implicits._
    // the hazardous shape, minimally: one shared input, two branches
    // both ending in repartition(32, doc_id), union, distinct, then a
    // doc_id window consumed by a write
    val d = (1L to 400L).flatMap(i => (1L to 20L).map(p => (i, p)))
      .toDF("doc_id", "v")
    val a = d.repartition(32, col("doc_id"))
      .filter(pmod(crc32(concat_ws(":", col("doc_id"), col("v"))),
        lit(4)) === 0)
      .select(col("doc_id"), col("v").as("pos"))
    val b = d.repartition(32, col("doc_id"))
      .select(col("doc_id"), lit(21L).as("pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val out = a.unionByName(b).distinct()
      .withColumn("prev", coalesce(lag(col("pos"), 1).over(w), lit(0L)))
      .withColumn("rn", row_number().over(w).cast("long"))
    val viaCollect = out.collect().toSeq
      .sortBy(r => (r.getLong(0), r.getLong(1)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_union_reuse_probe").toString
    out.write.mode("overwrite").parquet(dir)
    val viaWrite = spark.read.parquet(dir).collect().toSeq
      .sortBy(r => (r.getLong(0), r.getLong(1)))
    if (viaWrite != viaCollect) {
      val diffs = viaWrite.zip(viaCollect).count { case (x, y) => x != y }
      info(s"HAZARD PRESENT in this Spark build: write path diverges " +
        s"from collect on the reproducer shape ($diffs/${viaWrite.size} " +
        "rows differ) — upstream-report material; the engine avoids " +
        "this shape (cdcChunks docstring)")
    } else {
      info("hazard shape reads clean on this Spark build")
    }
    // the GUARD above is the assertion; this probe documents the
    // planner's current behavior without coupling the suite to it
  }
}
