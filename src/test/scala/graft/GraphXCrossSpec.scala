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

  test("q_report_triangles_approx: exact at L=0; under forced " +
    "sampling every per-vertex count is a subset of the exact count " +
    "and the global mass sits inside the binomial band") {
    import graft.operators.{Graph => G}
    val exact = SparkEntry.queries("q_report_triangles")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t = exact.values.sum / 3 // every triangle counted at 3 vertices
    assert(t > 0, "test corpus has no triangles")
    // an unreachable rate constant keeps every edge: L = 0, scale 1,
    // and the estimates ARE the exact counts
    val atL0 = G.reportTrianglesApproxAt(spark, sf, Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atL0 === exact, "L=0 twin must equal the exact counts")
    // force a real sampling level and replay the level arithmetic
    val cube = 16L
    val m = G.reportEdges(spark, sf)
      .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
      .distinct().count()
    val bound = BigInt(cube) * BigInt(m) * BigInt(m)
    var lvl = 0
    while (lvl < 20 && BigInt(m >> lvl).pow(3) > bound) lvl += 1
    assert(lvl >= 1, s"K=$cube must force sampling on m=$m edges")
    val scale = 1L << (3 * lvl)
    val est = G.reportTrianglesApproxAt(spark, sf, cube)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangles of the sampled graph are a SUBSET of the exact ones:
    // per vertex, the surviving count never exceeds the true count,
    // and no vertex outside the exact map can appear
    for ((v, e) <- est) {
      assert(e % scale === 0L, s"estimate $e must be a multiple of 8^L")
      assert(exact.contains(v), s"vertex $v estimated but not exact")
      assert(e / scale <= exact(v),
        s"vertex $v: sampled count ${e / scale} > exact ${exact(v)}")
    }
    // unbiasedness: surviving triangle mass X ~ mean T·p³ with
    // sd ≤ √(T·p³) (+ positive edge-sharing covariance → 5σ + 1 slack)
    val p3 = 1.0 / scale
    val x = est.values.sum.toDouble / (3.0 * scale)
    val mean = t * p3
    val sd = math.sqrt(t * p3 * (1 - p3))
    assert(math.abs(x - mean) <= 5 * sd + 1,
      s"sampled mass $x outside the binomial band around $mean (sd $sd)")
  }
}
