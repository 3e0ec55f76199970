package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The r21 ANN kernels (MicroVec / SqDistL2 / PqRecon / Sq8Recon)
  * must equal the higher-order-function forms they replaced — on the
  * REAL embeddings table (the distribution parity depends on) and on
  * adversarial rows (exact .5 rounding boundaries, negatives, nulls).
  * The HOF forms here are byte-identical to the pre-r21 Similarity
  * expressions.
  */
class VecKernelsSpec extends SparkSpec {

  private val sfTiny = "/root/testdata/sf0.001"

  private def microOf(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1e6).cast("long"))

  private def emb: DataFrame =
    Tables.embeddings(spark, sfTiny).select("vec_id", "embedding")

  // a tiny deterministic codebook in the trained shape: 4 entries of
  // 64 longs (sorted ids — the argmin tie order depends on it)
  private val cb: Array[(Long, Array[Long])] =
    (0L until 4L).map { l =>
      (l, Array.tabulate(64)(i => ((l * 64 + i) * 2654435761L % 2000001)
        - 1000000))
    }.toArray

  private val pqSub = 4
  private val subDim = 16

  private def pqReconHof(codebook: Array[(Long, Array[Long])]): Column = {
    val em = microOf(col("embedding"))
    element_at(transform(array(em), m =>
      concat((0 until pqSub).map { j =>
        val sub = slice(m, j * subDim + 1, subDim)
        val best = array_min(array(codebook.map { case (lbl, cvec) =>
          val scvec = cvec.slice(j * subDim, (j + 1) * subDim)
          struct(
            aggregate(zip_with(sub, typedlit(scvec.toSeq),
              (x, c) => (x - c) * (x - c)), lit(0L), (acc, d) => acc + d)
              .as("dist"),
            lit(lbl).as("cell"))
        }: _*)).getField("cell")
        val cbm = map_from_arrays(
          typedlit(codebook.map(_._1).toSeq),
          typedlit(codebook.map(_._2.slice(j * subDim,
            (j + 1) * subDim).toSeq).toSeq))
        element_at(cbm, best)
      }: _*)), 1)
  }

  private def pqCodesHof(codebook: Array[(Long, Array[Long])]): Column = {
    val em = microOf(col("embedding"))
    element_at(transform(array(em), m =>
      array((0 until pqSub).map { j =>
        val sub = slice(m, j * subDim + 1, subDim)
        array_min(array(codebook.map { case (lbl, cvec) =>
          val scvec = cvec.slice(j * subDim, (j + 1) * subDim)
          struct(
            aggregate(zip_with(sub, typedlit(scvec.toSeq),
              (x, c) => (x - c) * (x - c)), lit(0L), (acc, d) => acc + d)
              .as("dist"),
            lit(lbl).as("cell"))
        }: _*)).getField("cell")
      }: _*)), 1)
  }

  private def idiv(n: Column, d: Column): Column =
    ((n - pmod(n, d)) / d).cast("long")

  private def sq8ReconHof(mn: Array[Long], span: Array[Long]): Column = {
    val codes = zip_with(
      zip_with(microOf(col("embedding")), typedlit(mn.toSeq),
        (x, m) => x - m),
      typedlit(span.toSeq), (d, sp) => idiv(d * 255, sp + 1))
    zip_with(
      zip_with(codes, typedlit(mn.toSeq),
        (c, m) => struct(c.as("c"), m.as("m"))),
      typedlit(span.toSeq),
      (cm, sp) => cm.getField("m") +
        idiv((cm.getField("c") * 2 + 1) * (sp + 1), lit(510L)))
  }

  private def assertNoDiff(df: DataFrame, what: String): Unit = {
    val bad = df.filter(not(col("want") <=> col("got")))
    assert(bad.count() == 0,
      s"$what diverges: ${bad.take(3).mkString("; ")}")
  }

  test("MicroVec equals the transform/round form on real embeddings " +
    "and .5 boundaries") {
    assertNoDiff(emb.select(microOf(col("embedding")).as("want"),
      graft.functions.MicroVec.of(col("embedding"), 1000000L).as("got")),
      "MicroVec(real)")
    // adversarial: exact micro .5 boundaries (x*1e6 ends in .5),
    // negatives, zero, and a null element
    val rows = Seq(
      Seq[java.lang.Float](0.0000005f, -0.0000005f, 1.5e-6f, -1.5e-6f),
      Seq[java.lang.Float](0.1234565f, -0.9999995f, 1.0f, -1.0f),
      Seq[java.lang.Float](0f, 0.25f, null, 0.75f))
    val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("embedding")
    assertNoDiff(df.select(microOf(col("embedding")).as("want"),
      graft.functions.MicroVec.of(col("embedding"), 1000000L).as("got")),
      "MicroVec(edges)")
  }

  test("SqDistL2 equals the zip_with/aggregate form incl. null and " +
    "length-mismatch edges") {
    val hof = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, d) => acc + d)
    val rows = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](3L, 2L, 1L)),
      (Seq[java.lang.Long](-5L, 7L), Seq[java.lang.Long](5L, -7L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L)),   // mismatch
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)), // null el
      (Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    assertNoDiff(df.select(hof(col("a"), col("b")).as("want"),
      graft.functions.SqDistL2.of(col("a"), col("b")).as("got")),
      "SqDistL2")
    // and on the real shape: micro probe vs micro embedding
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val real = emb.crossJoin(probe)
      .select(microOf(col("embedding")).as("a"),
        microOf(col("probe")).as("b"))
    assertNoDiff(real.select(hof(col("a"), col("b")).as("want"),
      graft.functions.SqDistL2.of(col("a"), col("b")).as("got")),
      "SqDistL2(real)")
  }

  test("PqRecon/PqCodes equal the composed argmin forms on real " +
    "embeddings under a synthetic codebook") {
    assertNoDiff(emb.select(pqReconHof(cb).as("want"),
      graft.functions.PqRecon.recon(col("embedding"), cb, pqSub).as("got")),
      "PqRecon")
    assertNoDiff(emb.select(pqCodesHof(cb).as("want"),
      graft.functions.PqRecon.codes(col("embedding"), cb, pqSub).as("got")),
      "PqCodes")
  }

  test("PqRecon argmin tie goes to the smallest cell id (array_min " +
    "struct order)") {
    // two identical codebook entries: the tie must resolve to id 0
    val tied = Array((0L, cb(1)._2), (1L, cb(1)._2), (2L, cb(2)._2),
      (3L, cb(3)._2))
    assertNoDiff(emb.select(pqCodesHof(tied).as("want"),
      graft.functions.PqRecon.codes(col("embedding"), tied, pqSub)
        .as("got")), "PqCodes(tied)")
  }

  test("Sq8Recon equals the zip_with chain on real embeddings under " +
    "real bounds") {
    // real corpus bounds, computed the way sq8Bounds trains them
    val rows = emb
      .select(posexplode(microOf(col("embedding"))).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos").collect()
    val mn = rows.map(_.getLong(1))
    val span = rows.map(r => r.getLong(2) - r.getLong(1))
    assertNoDiff(emb.select(sq8ReconHof(mn, span).as("want"),
      graft.functions.Sq8Recon.of(col("embedding"), mn, span).as("got")),
      "Sq8Recon")
  }
}
