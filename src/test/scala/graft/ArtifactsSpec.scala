package graft

import org.apache.spark.sql.DataFrame

/** Lifetime contract of the [[Artifacts]] registry (r6 verdict item 3 /
  * advice item 4): artifacts are built once per (session, corpus),
  * clear() releases the handle, and the next call rebuilds an
  * equivalent artifact from scratch.
  */
class ArtifactsSpec extends SparkSpec {

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("artifact handles are built once and shared while live") {
    val a = operators.Dedup.clusterMap(spark, sf)
    val b = operators.Dedup.clusterMap(spark, sf)
    assert(a eq b, "second consumer must read the same handle")
    assert(Artifacts.liveEntries >= 1)
  }

  test("clear(session, dir) releases the handle; the next call " +
    "rebuilds an equivalent artifact") {
    val first = operators.Dedup.clusterMap(spark, sf)
    val rows = sorted(first)
    Artifacts.clear(spark, sf)
    val rebuilt = operators.Dedup.clusterMap(spark, sf)
    assert(!(rebuilt eq first), "clear() must drop the old handle")
    assert(sorted(rebuilt) === rows, "rebuild must be value-identical")
  }

  test("clear(session) sweeps every artifact family of the session") {
    operators.Dedup.clusterMap(spark, sf)
    operators.Similarity.cellsIndex(spark, sf)
    operators.TextAnalysis.fpIndex(spark, sf)
    operators.Similarity.ivfCodebook(spark, sf)
    assert(Artifacts.liveEntries >= 4)
    Artifacts.clear(spark)
    assert(Artifacts.liveEntries === 0,
      "a session-wide clear must leave no live entries for it")
    // and the engine recovers: a consumer just rebuilds
    assert(operators.Similarity.cellsIndex(spark, sf).count() > 0)
  }

  test("clear is corpus-scoped: another dir's artifacts survive") {
    val other = "/root/testdata/sf0.01"
    Artifacts.clear(spark)
    operators.TextAnalysis.fpIndex(spark, sf)
    operators.TextAnalysis.fpIndex(spark, other)
    val live = Artifacts.liveEntries
    assert(live >= 2)
    Artifacts.clear(spark, sf)
    assert(Artifacts.liveEntries === live - 1,
      "only the cleared corpus' entry may drop")
    Artifacts.clear(spark)
  }
}
