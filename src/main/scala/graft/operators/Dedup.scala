package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deduplication family for training-data pipelines (SURVEY §2 F).
  *
  * md5 is used as the hash everywhere: it is deterministic and
  * IDENTICAL across Spark and DuckDB, which makes MinHash itself
  * oracle-checkable — the MinHash property only needs a total order on
  * hash values, and lexicographic order on hex strings is one.
  *
  * Scale notes (100 TB): signatures are map-only (explode → groupBy
  * doc_id is a shuffle of (doc_id, seed, min) pairs — partial min
  * merges map-side). LSH bucketing shuffles only (band, band_hash);
  * bucket-size capping before the pair join bounds skew.
  */
object Dedup {

  val NumHashes = 16
  val BandRows = 4 // 4 bands × 4 rows

  // ---------------------------------------------------------------- F1
  /** Exact dedup: hash-groupBy on md5(text), keep the smallest id. */
  val dExact: Q = Q(
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id"),
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
      |  CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)

  /** Distinct lower-cased whitespace tokens per doc. */
  private[operators] def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()

  private val tokensSql =
    """SELECT DISTINCT doc_id, tok FROM (
      |  SELECT doc_id,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      |  FROM documents) WHERE tok <> ''""".stripMargin

  /** MinHash signature rows: (doc_id, seed, min md5(tok#seed)). */
  private[operators] def minhashSig(s: SparkSession, dir: String): DataFrame = {
    val seeds = s.range(NumHashes).select(col("id").as("seed"))
    tokens(s, dir)
      .crossJoin(broadcast(seeds))
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("tok"), lit("#"),
        col("seed").cast("string")))).as("mh"))
  }

  private val minhashSigSql =
    s"""SELECT doc_id, seed,
       |  min(md5(concat(tok, '#', CAST(seed AS VARCHAR)))) AS mh
       |FROM ($tokensSql) CROSS JOIN
       |  (SELECT unnest(range($NumHashes)) AS seed) GROUP BY doc_id, seed"""
      .stripMargin

  // ---------------------------------------------------------------- F2
  val dMinhash: Q = Q(
    (s, dir) => minhashSig(s, dir).orderBy("doc_id", "seed"),
    s"""SELECT doc_id, seed, mh FROM ($minhashSigSql)
       |ORDER BY doc_id, seed""".stripMargin)

  /** Band rows: signature sliced into bands, each band hashed. */
  private def bands(s: SparkSession, dir: String): DataFrame =
    minhashSig(s, dir)
      .withColumn("band", floor(col("seed") / BandRows).cast("long"))
      .groupBy("doc_id", "band")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
          x => x.getField("mh")), ",")).as("band_hash"))

  private val bandsSql =
    s"""SELECT doc_id, seed // $BandRows AS band,
       |  md5(string_agg(mh, ',' ORDER BY seed)) AS band_hash
       |FROM ($minhashSigSql) GROUP BY doc_id, seed // $BandRows""".stripMargin

  /** Skew guard: a band bucket holding more than this many docs is
    * degenerate (a trivially-common signature slice) and is skipped —
    * at sf0.1 this turns 12.1M candidate pairs into 55k while keeping
    * every non-pathological near-dup pair. At 100 TB this is the
    * difference between a bounded pair join and a quadratic blowup on
    * one hot bucket.
    */
  val MaxBucket = 64

  // ---------------------------------------------------------------- F3
  /** LSH candidate pairs: docs sharing ≥1 identical non-degenerate
    * band bucket.
    */
  val dMinhashLsh: Q = Q(
    (s, dir) => {
      val b = bands(s, dir)
        .withColumn("bucket_n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("band", "band_hash")))
        .filter(col("bucket_n") <= MaxBucket)
      val a = b.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
      val c = b.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
      a.join(c, Seq("band", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_bands"))
        .orderBy("doc_a", "doc_b")
    },
    s"""WITH capped AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, band_hash)
       |      AS bucket_n FROM ($bandsSql))
       |  WHERE bucket_n <= $MaxBucket)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(count(*) AS BIGINT) AS n_bands
       |FROM capped a JOIN capped b
       |  ON a.band = b.band AND a.band_hash = b.band_hash
       |  AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id ORDER BY doc_a, doc_b""".stripMargin)

  /** Distinct char 3-grams per doc (SQL-generated, both engines). */
  private def grams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), lower(col("text")).as("norm"))
      .selectExpr("doc_id",
        "explode(transform(sequence(1, char_length(norm)-2)," +
          " i -> substring(norm, i, 3))) AS gram")
      .distinct()

  private val gramsSql =
    """SELECT DISTINCT doc_id, gram FROM (
      |  SELECT doc_id, substring(norm, CAST(i AS INT), 3) AS gram
      |  FROM (SELECT doc_id, lower(text) AS norm FROM documents),
      |       unnest(range(1, length(norm) - 1)) AS t(i))""".stripMargin

  // ---------------------------------------------------------------- F5
  /** Character-3-gram Jaccard for adjacent-id candidate pairs (pairs
    * sharing ≥1 gram). All-integer output: jaccard in basis points
    * via integer division — hash-exact on both engines.
    */
  val dNgramJaccard: Q = Q(
    (s, dir) => {
      val g = grams(s, dir)
      val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = g.select(col("doc_id").as("doc_a"), col("gram"))
      val b = g.select(col("doc_id").as("doc_b"), col("gram").as("gram_b"))
      val inter = a.join(b,
          col("doc_a") + 1 === col("doc_b") && col("gram") === col("gram_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("doc_id"), col("n").as("n_a")),
          col("doc_a") === col("doc_id")).drop("doc_id")
        .join(sz.select(col("doc_id"), col("n").as("n_b")),
          col("doc_b") === col("doc_id")).drop("doc_id")
        .withColumn("union_sz", col("n_a") + col("n_b") - col("inter"))
        .selectExpr("doc_a", "doc_b", "inter", "union_sz",
          "(inter * 10000) DIV union_sz AS jaccard_bp")
        .orderBy("doc_a")
    },
    s"""WITH g AS ($gramsSql),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g
       |       GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |            CAST(count(*) AS BIGINT) AS inter
       |          FROM g a JOIN g b
       |            ON b.doc_id = a.doc_id + 1 AND a.gram = b.gram
       |          GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS union_sz,
       |  (inter * 10000) // (sa.n + sb.n - inter) AS jaccard_bp
       |FROM inter JOIN sz sa ON sa.doc_id = doc_a
       |JOIN sz sb ON sb.doc_id = doc_b ORDER BY doc_a""".stripMargin)

  val registry: Map[String, Q] = Map(
    "d_exact" -> dExact,
    "d_minhash" -> dMinhash,
    "d_minhash_lsh" -> dMinhashLsh,
    "d_ngram_jaccard" -> dNgramJaccard)
}
