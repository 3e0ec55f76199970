package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Settings, Tables}

/** Builder-owned scale-up generator for the scaling-curve evidence
  * (r12 verdict item 5): the driver's testdata stops at sf0.1, and
  * the engine's 100× claims were argued from plan shape alone. This
  * tool derives an sfN corpus from the driver's sf0.1 tables by
  * replicating each table `factor`× under transforms chosen so that
  * PER-FAMILY WORKLOAD SHAPE is preserved while nothing artificial
  * leaks across replicas:
  *
  *  - Facts (lineitem/orders/events) replicate with key offsets that
  *    keep every foreign key inside its replica — per-key group sizes
  *    (events per user, lines per order) stay CONSTANT while key
  *    cardinality grows with sf, which is exactly how TPC-H itself
  *    scales. Dates/prices are untouched (TPC-H date ranges do not
  *    grow with sf either).
  *  - Fixed dims (region, nation) stay fixed; scaling dims
  *    (customer/supplier/part) grow with their facts.
  *  - `documents` applies a per-replica VOCABULARY PERMUTATION: a
  *    bijection on tokens preserves every intra-replica statistic
  *    exactly (doc lengths, token counts, shingle-set Jaccard — so
  *    the dup/near-dup structure the dedup family hunts replicates
  *    per copy) while cross-replica shingle similarity falls to the
  *    corpus's own random-pair baseline (spec-measured) — replication
  *    manufactures NO pair more similar than the corpus already makes
  *    two random docs (a naive copy would hand every doc `factor−1`
  *    EXACT twins and inflate every pair join quadratically — a fake
  *    superlinearity the curve exists to rule out).
  *  - `embeddings` applies a per-replica DIMENSION PERMUTATION — an
  *    orthogonal transform, so all intra-replica cosines (and thus
  *    kNN/ANN structure per replica) are preserved exactly (up to
  *    float summation order) while a vector and its cross-replica
  *    images decorrelate.
  *
  * Determinism: every permutation is seeded by md5(value + replica);
  * two runs produce byte-identical tables. The output lands under the
  * repo's own dir (driver testdata is read-only) and is NOT committed
  * — the generator is; BASELINE.md records the measured curve.
  *
  * Usage: runMain graft.tools.ScaleGen [srcDir dstDir factor]
  */
object ScaleGen {

  private def md5key(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Per-replica token bijection: identity at r=0, an md5-seeded
    * permutation of the corpus vocabulary for every later replica.
    */
  private[graft] def vocabPerm(vocab: Seq[String],
      r: Int): Map[String, String] =
    if (r == 0) vocab.map(w => w -> w).toMap
    else {
      val shuffled = vocab.sortBy(w => md5key(s"$w|$r"))
      vocab.sorted.zip(shuffled).toMap
    }

  /** Per-replica dimension permutation — orthogonal, cosine-exact
    * inside the replica.
    */
  private[graft] def dimPerm(dim: Int, r: Int): Seq[Int] =
    if (r == 0) 0 until dim
    else (0 until dim).sortBy(i => md5key(s"$i|$r"))

  /** One offset unit per key domain: a clean power of 10 ABOVE the
    * sf0.1 maximum, so replica key ranges never collide and `% k`
    * carves (doc_id % 5, user salts) keep their per-replica classes.
    */
  private val OrderStep = 1000000L
  private val CustStep  = 100000L
  private val PartStep  = 100000L
  private val SuppStep  = 10000L
  private val EventStep = 1000000L
  private val UserStep  = 10000L
  private val DocStep   = 10000L
  private val VecStep   = 10000L

  private def replicate(base: DataFrame, factor: Int)(
      f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => f(base, r)).reduce(_.unionAll(_))

  /** The fixed boilerplate block for the skew derivation: 80 tokens,
    * so a skewed doc's MinHash minima come from the shared block with
    * probability ≈ 80/81 per seed — most skewed docs collapse into
    * ONE band bucket per band (the license-header degeneracy the
    * occupancy caps exist for).
    */
  private[graft] val SkewBoiler: String =
    (0 until 80).map(i => s"lic${i}term").mkString(" ")

  /** Share of rows redirected into the degenerate bucket: doc_id /
    * vec_id % 7 == 0 ≈ 14% — inside the 10-20% band the r14 verdict
    * prescribed for the probe corpus.
    */
  private[graft] val SkewMod = 7L

  def generate(spark: SparkSession, src: String, dst: String,
      factor: Int, skew: Boolean = false): Unit = {
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // COLLISION GUARD (r18 — learned the hard way): the offset steps
    // are sized for the DRIVER's sf0.1 key ranges. Scaling an
    // already-scaled corpus (sf1 → sf10) re-offsets keys whose range
    // ALREADY spans multiple steps, so replica key ranges overlap:
    // duplicate doc_ids, cross-replica join fan-out (q3's lineitem ⋈
    // orders read 600M rows instead of 12M), and every per-key carve
    // silently corrupted. Deriving a larger SF is ALWAYS done from
    // sf0.1 with a larger factor; this require makes the misuse loud.
    val keyMax = Seq(
      "o_orderkey" -> (Tables.orders(spark, src), OrderStep),
      "c_custkey" -> (Tables.customer(spark, src), CustStep),
      "doc_id" -> (Tables.documents(spark, src), DocStep),
      "vec_id" -> (Tables.embeddings(spark, src), VecStep))
    keyMax.foreach { case (k, (t, step)) =>
      // max() of an empty table is NULL — getAs boxes it so an empty
      // source reads as vacuously safe instead of an opaque NPE
      // swallowing the guard's message (r18 advice)
      val mx = Option(t.agg(max(col(k))).head()
        .getAs[java.lang.Long](0)).map(_.longValue())
      require(mx.forall(_ < step),
        s"ScaleGen: source $src has max($k) = ${mx.orNull} >= its " +
          s"offset step $step — replica key ranges would overlap. " +
          "Generate from the driver's sf0.1 with a larger factor " +
          "instead of re-scaling an already-scaled corpus.")
    }

    // fixed dims: byte-identical copies
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(replicate(Tables.customer(spark, src), factor) { (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * CustStep))
    }, "customer")

    write(replicate(Tables.supplier(spark, src), factor) { (d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * SuppStep))
    }, "supplier")

    write(replicate(Tables.part(spark, src), factor) { (d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * PartStep))
    }, "part")

    write(replicate(Tables.orders(spark, src), factor) { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * OrderStep))
        .withColumn("o_custkey", col("o_custkey") + lit(r * CustStep))
    }, "orders")

    write(replicate(Tables.lineitem(spark, src), factor) { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * OrderStep))
        .withColumn("l_partkey", col("l_partkey") + lit(r * PartStep))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * SuppStep))
    }, "lineitem")

    write(replicate(Tables.events(spark, src), factor) { (d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * EventStep))
        .withColumn("user_id", col("user_id") + lit(r * UserStep))
    }, "events")

    // documents: per-replica vocabulary permutation (see scaladoc).
    // The vocabulary is corpus-bounded (collect is vocab-sized).
    val docs = Tables.documents(spark, src)
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct().collect().map(_.getString(0)).toSeq
    val docsRep = replicate(docs, factor) { (d, r) =>
      val pm = typedLit(vocabPerm(vocab, r))
      d.withColumn("doc_id", col("doc_id") + lit(r * DocStep))
        .withColumn("text", array_join(transform(
          split(col("text"), " "),
          t => coalesce(element_at(pm, t), t)), " "))
        .withColumn("n_chars", length(col("text")))
    }
    // skew derivation (r14 verdict #2): ~1/SkewMod of all docs get
    // the SAME boilerplate token block plus one per-doc token — their
    // MinHash bands collapse into one degenerate bucket per band,
    // CROSS-replica (the permutation is applied first, the shared
    // block after), which is exactly the adversarial shape the
    // MaxBucket policy and the groupBy-occupancy plan must absorb
    write(
      if (!skew) docsRep
      else docsRep.withColumn("text",
          when(col("doc_id") % SkewMod === 0,
            concat(lit(SkewBoiler), lit(" uid"),
              col("doc_id").cast("string")))
            .otherwise(col("text")))
        .withColumn("n_chars", length(col("text"))),
      "documents")

    // embeddings: per-replica dimension permutation
    val emb = Tables.embeddings(spark, src)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val embRep = replicate(emb, factor) { (d, r) =>
      val perm = typedLit(dimPerm(dim, r))
      d.withColumn("vec_id", col("vec_id") + lit(r * VecStep))
        .withColumn("embedding", transform(perm,
          p => element_at(col("embedding"), p + 1)))
    }
    // skew: ~1/SkewMod of all vectors become one fixed direction plus
    // a tiny per-vec epsilon — distinct rows, one hot quantizer cell
    write(
      if (!skew) embRep
      else embRep.withColumn("embedding",
        when(col("vec_id") % SkewMod === 0,
          transform(sequence(lit(1), lit(dim)), i =>
            when(i === 1, lit(1.0d))
              .otherwise(when(i === 2,
                (col("vec_id") % 97).cast("double") / lit(1000000.0d))
                .otherwise(lit(0.0d)))
              .cast("float")))
          .otherwise(col("embedding"))),
      "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/testdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val skew = args.length > 3 && args(3) == "--skew"
    val spark = Settings.fromEnv().buildSession(aqe = true)
    generate(spark, src, dst, factor, skew)
    println(s"""{"metric":"scalegen","src":"$src","dst":"$dst","factor":$factor,"skew":$skew}""")
    spark.stop()
  }
}
