package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry size invariants (r16 verdict #4): each family's query
  * registry is a `Map(...)` literal, and Scala Maps silently keep the
  * LAST binding for a duplicated key — a copy-paste collision would
  * drop a query from the oracle gate with no test failing (r16 found
  * exactly that shape: a benign self-collision on
  * `s_ann_ivf_km_probe`). Pinning each family's size, the total, and
  * the queries/oracle key agreement turns a silent drop into a red
  * test. Update the pinned numbers ON PURPOSE when adding a query.
  */
class RegistrySpec extends AnyFunSuite {

  test("family registry sizes pin the oracle surface") {
    assert(graft.operators.Cleanse.registry.size === 7)
    assert(graft.operators.Star.registry.size === 18)
    assert(graft.operators.Analytics.registry.size === 32)
    assert(graft.operators.Dedup.registry.size === 34)
    assert(graft.operators.TextAnalysis.registry.size === 30)
    assert(graft.operators.Similarity.registry.size === 31)
    assert(graft.operators.MultiModal.registry.size === 2)
    assert(graft.operators.Graph.registry.size === 10)
    assert(graft.sources.LakeMerge.registry.size === 12)
  }

  test("SparkEntry serves every registry row, with an oracle each") {
    assert(SparkEntry.queries.size === 176,
      "total oracle-gated query count (update on purpose only)")
    assert(SparkEntry.oracleSql.size === SparkEntry.queries.size)
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet,
      "every query needs its DuckDB oracle under the SAME key")
    // family maps must not shadow each other across ++ either
    val familySum = Seq(
      graft.operators.Cleanse.registry, graft.operators.Star.registry,
      graft.operators.Analytics.registry, graft.operators.Dedup.registry,
      graft.operators.TextAnalysis.registry,
      graft.operators.Similarity.registry,
      graft.operators.MultiModal.registry, graft.operators.Graph.registry,
      graft.sources.LakeMerge.registry).map(_.size).sum
    assert(familySum === SparkEntry.queries.size,
      "a key collision ACROSS family registries dropped a query")
  }
}
