package graft

import org.apache.spark.graphx.{Edge, Graph}
import graft.operators.Dedup

/** Independent cross-validation of the dedup clustering: the engine's
  * bounded min-label propagation ([[Dedup.propagate]] — converge-early
  * DataFrame loop) must produce EXACTLY the connected components that
  * GraphX's Pregel implementation finds on the same edge set. Both
  * label a component by its minimum vertex id, so the maps must be
  * row-identical — a completely separate implementation (RDD/Pregel vs
  * Catalyst plans) agreeing on every row is strong evidence the
  * propagation reaches the true fixpoint, not just a stable-looking
  * state. GraphX stays test-side only: the engine's own clustering
  * remains the declarative DataFrame form.
  */
class GraphXCrossSpec extends SparkSpec {

  test("d_dup_clusters ≡ GraphX connectedComponents on the same edges") {
    val ours = SparkEntry.queries("d_dup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Dedup.dupEdges(spark, sf)
      .collect().map(r => Edge(r.getLong(0), r.getLong(1), 1))
    assert(edges.nonEmpty, "test corpus produced no dup edges")
    val g = Graph.fromEdges(spark.sparkContext.parallelize(edges.toSeq), 1)
    val cc = g.connectedComponents().vertices.collect().toMap
    assert(ours.keySet === cc.keySet,
      "cluster map covers a different vertex set than GraphX")
    for ((doc, label) <- ours)
      assert(label === cc(doc),
        s"doc $doc: propagate said $label, GraphX said ${cc(doc)}")
  }

  test("q_report_components ≡ GraphX connectedComponents on the " +
    "report graph — third independent implementation, same rows") {
    val ours = SparkEntry.queries("q_report_components")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = graft.operators.Graph.reportEdges(spark, sf)
      .collect().map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val g = Graph.fromEdges(spark.sparkContext.parallelize(edges.toSeq), 1)
    val cc = g.connectedComponents().vertices.collect()
      .map { case (v, l) => v -> l }.toMap
    assert(ours === cc,
      "propagation disagrees with GraphX on the report graph")
  }

  test("q_report_triangles ≡ GraphX triangleCount on the same graph") {
    val ours = SparkEntry.queries("q_report_triangles")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same undirected simple graph: GraphX's triangleCount wants
    // canonical (src < dst) deduplicated edges
    val edges = graft.operators.Graph.reportEdges(spark, sf)
      .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
      .distinct()
      .collect().map(r => Edge(r.getLong(0), r.getLong(1), 1))
    assert(edges.nonEmpty, "test corpus produced no report edges")
    val g = Graph.fromEdges(spark.sparkContext.parallelize(edges.toSeq), 1)
    val counts = g.triangleCount().vertices.collect().toMap
    // our query emits only players in ≥1 triangle; GraphX emits all
    val gx = counts.filter(_._2 > 0).map { case (v, n) => v -> n.toLong }
    assert(ours === gx,
      "degree-oriented enumeration disagrees with GraphX triangleCount")
  }
}
