package graft

import org.apache.spark.sql.functions._

/** The r21 single-task fast paths must equal the distributed loops
  * they shortcut, row for row, on the real corpus — the equivalence
  * that makes the row-count gates pure performance switches.
  */
class LocalPathSpec extends SparkSpec {

  test("graph walk: local single-task path equals the distributed " +
    "loop row-for-row") {
    import graft.operators.Similarity
    val local = Similarity.graphWalk(spark, sf).collect().toSeq
    val dist = Similarity.graphWalk(spark, sf, forceDistributed = true)
      .collect().toSeq
    assert(local === dist,
      s"walk paths diverge:\nlocal=$local\ndist =$dist")
  }

  test("propagate: local union-find path equals the jump loop on the " +
    "real dup-edge graph") {
    import graft.operators.Dedup
    val edges = Dedup.dupEdges(spark, sf).localCheckpoint(true)
    val labels0 = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    // budget == ItersBudget takes the union-find fast path; one round
    // short of it forces the distributed jump loop (still far above
    // the rounds this graph needs, so both converge)
    val local = Dedup.propagate(edges, labels0, Dedup.ItersBudget)
    val loop = Dedup.propagate(edges, labels0, Dedup.ItersBudget - 1)
    assert(local.exceptAll(loop).isEmpty && loop.exceptAll(local).isEmpty,
      "propagate paths diverge on the real corpus")
  }

  test("propagate local path honors non-identity labels0 (component " +
    "min of INITIAL labels)") {
    import spark.implicits._
    import graft.operators.Dedup
    // two components {1,2,3} and {10,11}; labels0 values are NOT the
    // node ids — the flood fixpoint is the component min of the
    // initial label VALUES
    val half = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val edges = half.unionAll(half.select(col("doc_b").as("doc_a"),
      col("doc_a").as("doc_b"))).localCheckpoint(true)
    val labels0 = Seq((1L, 100L), (2L, 50L), (3L, 200L), (10L, 7L),
      (11L, 9L)).toDF("doc_id", "label")
    val got = Dedup.propagate(edges, labels0, Dedup.ItersBudget)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 50L, 2L -> 50L, 3L -> 50L,
      10L -> 7L, 11L -> 7L))
  }
}
