package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleGen

/** The scale-up generator's contract (r12 verdict item 5): a derived
  * sfN corpus must grow VOLUME and KEY CARDINALITY by the factor
  * while preserving per-replica workload shape exactly — and must
  * manufacture nothing across replicas (no spurious dup pairs, no
  * cross-replica cosine twins) that would fake a superlinear curve.
  */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft_sgen").toString
    ScaleGen.generate(spark, sf, d, 2)
    d
  }

  test("volume and cardinality scale by the factor; fixed dims stay " +
    "fixed; replica foreign keys resolve inside their replica") {
    def n(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(n(dst, t) === 2 * n(sf, t), t)
    for (t <- Seq("region", "nation"))
      assert(n(dst, t) === n(sf, t), t)
    // key cardinality doubled (replication never collides keys)
    assert(spark.read.parquet(s"$dst/documents.parquet")
      .select("doc_id").distinct().count() ===
      2 * spark.read.parquet(s"$sf/documents.parquet").count())
    // every lineitem resolves to an order of its own replica
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val o = spark.read.parquet(s"$dst/orders.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() === 0)
    // per-key group size is CONSTANT across the scale-up (the TPC-H
    // scaling law: facts per key stay flat, keys grow)
    val evSrc = Tables.events(spark, sf)
      .groupBy("user_id").count().agg(avg("count")).head().getDouble(0)
    val evDst = spark.read.parquet(s"$dst/events.parquet")
      .groupBy("user_id").count().agg(avg("count")).head().getDouble(0)
    assert(math.abs(evSrc - evDst) < 1e-9)
  }

  test("documents: vocabulary permutation preserves intra-replica " +
    "structure exactly and manufactures no cross-replica duplicates") {
    val srcDocs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val dstDocs = spark.read.parquet(s"$dst/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // replica 0 is the identity
    assert(dstDocs(0L) === srcDocs(0L))
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSet
    def jac(a: Set[String], b: Set[String]) =
      if (a.isEmpty && b.isEmpty) 1.0
      else (a & b).size.toDouble / (a | b).size
    // intra-replica Jaccard is EXACT under a token bijection: check
    // a spread of doc pairs in replica 1 against their source pairs
    val ids = srcDocs.keys.toSeq.sorted.take(40)
    for (Seq(a, b) <- ids.sliding(2).toSeq) {
      val srcJ = jac(toks(srcDocs(a)), toks(srcDocs(b)))
      val dstJ = jac(toks(dstDocs(a + 10000L)), toks(dstDocs(b + 10000L)))
      assert(math.abs(srcJ - dstJ) < 1e-12, s"pair ($a,$b)")
    }
    // token counts (and so per-doc work) are preserved per doc
    for (a <- ids)
      assert(dstDocs(a + 10000L).split(" ").count(_.nonEmpty) ===
        srcDocs(a).split(" ").count(_.nonEmpty), s"doc $a")
    // no cross-replica text collisions: distinct texts exactly double
    val dSrc = srcDocs.values.toSeq.distinct.size
    val dDst = dstDocs.values.toSeq.distinct.size
    assert(dDst === 2 * dSrc,
      "a replica text colliding with another replica would fake dups")
    // a doc's cross-replica image must be NO MORE similar to it than
    // a random pair of the source corpus — on the engine's own
    // shingle (char 3-grams, Dedup F5/F7): replication must add
    // nothing above the corpus's own baseline similarity (the
    // driver's tiny generator vocabulary makes that baseline high —
    // ~0.5 — which is the corpus's character, not the generator's)
    def c3(s: String): Set[String] =
      (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val cross = ids.map(a => jac(c3(srcDocs(a)), c3(dstDocs(a + 10000L))))
    val rand = ids.sliding(2).map { case Seq(a, b) =>
      jac(c3(srcDocs(a)), c3(srcDocs(b))) }.toSeq
    assert(median(cross) <= median(rand) + 0.05,
      s"cross-replica shingle similarity ${median(cross)} exceeds the " +
        s"corpus random-pair baseline ${median(rand)}")
  }

  test("embeddings: dimension permutation is orthogonal — " +
    "intra-replica cosines bit-exact, cross-replica images decorrelate") {
    val src = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val out = spark.read.parquet(s"$dst/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val ids = src.keys.toSeq.sorted.take(20)
    for (Seq(a, b) <- ids.sliding(2).toSeq) {
      // a permutation reorders the same multiplications — identical
      // up to float summation order (last-ulp)
      assert(math.abs(cos(out(a + 10000L), out(b + 10000L)) -
        cos(src(a), src(b))) < 1e-9, s"pair ($a,$b)")
    }
    // replica images of one vector are not near-dups of the original
    val crossMax = ids.map(a => cos(src(a), out(a + 10000L))).max
    assert(crossMax < 0.9, s"cross-replica cosine up to $crossMax")
  }
}
