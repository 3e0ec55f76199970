package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Degenerate-input hardening: the driver corpora never go below
  * ~44-char docs, but a 100 TB crawl absolutely contains empty and
  * tiny documents. Every gram/fingerprint operator must produce
  * EMPTY output for docs shorter than its gram width (matching
  * DuckDB's empty range()) instead of ANSI errors from descending
  * `sequence(1, n-k)` or division by zero.
  */
class ShortDocSpec extends SparkSpec {
  import spark.implicits._

  /** A documents table of pathological lengths: empty, 1, 2 chars
    * (below 3-gram width), 7 chars (below 8-gram width), and one
    * normal doc.
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_shortdocs").toString
    Seq(
      (1L, ""),
      (2L, "a"),
      (3L, "ab"),
      (4L, "1234567"),
      (5L, "a perfectly ordinary document, long enough for all grams."))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("t_fingerprint: docs under 8 chars yield zero fingerprints") {
    val fp = SparkEntry.queries("t_fingerprint")(spark, dir)
    assert(fp.filter(col("doc_id") < 5L).count() === 0)
    assert(fp.filter(col("doc_id") === 5L).count() > 0)
    assert(fp.filter(col("fp_hash").isNull).count() === 0)
  }

  test("d_ngram_jaccard: sub-3-char docs have empty gram sets") {
    // adjacent-id pairs over the tiny corpus: pairs touching short
    // docs must drop out via the inter >= 1 filter, not crash
    val j = SparkEntry.queries("d_ngram_jaccard")(spark, dir)
    assert(j.filter(col("doc_a") < 4L).count() === 0)
  }

  test("t_quality: empty doc scores without dividing by zero") {
    val q = SparkEntry.queries("t_quality")(spark, dir)
    assert(q.count() === 5)
    val empty = q.filter(col("doc_id") === 1L).head()
    assert(empty.getAs[Long]("n_chars") === 0L)
    assert(empty.getAs[Long]("punct_bp") === 0L)
  }

  test("t_tokens and t_langid run over degenerate docs") {
    assert(SparkEntry.queries("t_tokens")(spark, dir).count() === 5)
    assert(SparkEntry.queries("t_langid")(spark, dir).count() === 5)
  }

  test("t_pii_scrub finds and redacts planted PII") {
    val d = Files.createTempDirectory("graft_pii").toString
    Seq(
      (1L, "contact Bob.Smith+spam@example.co.uk or call 5551234567 now"),
      (2L, "no pii here, just words and the number 42"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("t_pii_scrub")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_longnums"))).toMap
    assert(out(1L) === ((1L, 1L)))
    assert(out(2L) === ((0L, 0L)), "short numbers are not PII")
    // redaction is total: scrubbed text contains neither pattern
    val scrubbed = Tables.documents(spark, d)
      .select(regexp_replace(regexp_replace(lower(col("text")),
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
        "[0-9]{7,}", "<NUM>").as("t"))
    assert(scrubbed.filter(col("t").contains("@") ||
      col("t").rlike("[0-9]{7,}")).count() === 0)
  }

  test("d_minhash and d_exact run over degenerate docs") {
    // empty doc has zero tokens → zero signature rows, not a crash
    val mh = SparkEntry.queries("d_minhash")(spark, dir)
    assert(mh.filter(col("doc_id") === 1L).count() === 0)
    assert(mh.filter(col("doc_id") === 5L).count() === Dedup.NumHashes)
    assert(SparkEntry.queries("d_exact")(spark, dir).count() === 5)
  }

  test("t_char_gini: empty doc drops out, single-char doc scores 0") {
    val g = SparkEntry.queries("t_char_gini")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("gini_bp")).toMap
    assert(!g.contains(1L), "empty doc must produce no gini row")
    assert(g(2L) === 0L, "one distinct char ⇒ zero impurity")
    assert(g(5L) > 0L)
  }

  test("t_oov: token-less docs drop out instead of dividing by zero") {
    val o = SparkEntry.queries("t_oov")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("oov_bp"))).toMap
    assert(!o.contains(1L))
    assert(o(5L)._1 > 0)
  }

  test("d_span_dup: sub-fingerprint docs never pair, normal docs may") {
    val p = SparkEntry.queries("d_span_dup")(spark, dir)
    assert(p.filter(col("doc_a") < 5L && col("doc_b") < 5L).count() === 0)
  }

  test("d_minhash_est: a candidate pair of sub-3-char docs is KEPT, " +
    "jaccard_bp NULL (engine/oracle agree on gram-less docs)") {
    // two identical 2-char docs: one shared token ⇒ identical
    // signatures ⇒ they share every band (an LSH candidate), but both
    // gram sets are empty ⇒ exact Jaccard is undefined. The r6 advice
    // divergence: the oracle's inner join on gram-derived sizes
    // DROPPED such pairs while Spark kept them — both must keep, with
    // est_bp = 10000 and jaccard_bp NULL (DIV by zero ⇒ NULL)
    val d = Files.createTempDirectory("graft_shortest").toString
    Seq((1L, "ab"), (2L, "ab"),
      (3L, "an ordinary document long enough for character grams"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val est = SparkEntry.queries("d_minhash_est")(spark, d).collect()
    val pair = est.filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.length === 1, "the short-doc candidate pair must survive")
    assert(pair.head.getAs[Long]("est_bp") === 10000L)
    assert(pair.head.isNullAt(pair.head.fieldIndex("jaccard_bp")),
      "undefined exact Jaccard must surface as NULL, not 0 or a crash")
  }

  test("t_chunk: degenerate docs chunk cleanly — empty yields no " +
    "window, tiny docs exactly one") {
    val c = SparkEntry.queries("t_chunk")(spark, dir).collect()
    assert(!c.exists(_.getLong(0) == 1L), "no tokens → no windows")
    val tiny = c.filter(r => r.getLong(0) >= 2L && r.getLong(0) <= 4L)
    assert(tiny.length === 3)
    assert(tiny.forall(r => r.getLong(1) == 0L && r.getLong(2) == 1L),
      "a sub-stride doc is exactly one window holding its one token")
  }

  test("d_dup_span_ratio / d_strip_spans: a corpus with no shared " +
    "8-grams scores zero and strips nothing") {
    val ratio = SparkEntry.queries("d_dup_span_ratio")(spark, dir)
      .collect()
    assert(ratio.length === 5, "every doc keeps a coverage row")
    assert(ratio.forall(_.getAs[Long]("dup_span_bp") == 0L))
    val strip = SparkEntry.queries("d_strip_spans")(spark, dir).collect()
    assert(strip.length === 5)
    assert(strip.forall(r =>
      r.getAs[Long]("n_kept") == r.getAs[Long]("n_tokens")),
      "nothing cross-doc-duplicated ⇒ nothing removed")
  }

  test("t_lm_score: bigram-less docs land in tail; the one real doc " +
    "still scores") {
    val sc = SparkEntry.queries("t_lm_score")(spark, dir).collect()
    assert(sc.length === 5)
    val tiny = sc.filter(_.getLong(0) <= 4L)
    assert(tiny.forall(r => r.getAs[Long]("n_bigrams") == 0L &&
      r.getAs[String]("bucket") == "tail"))
    assert(sc.find(_.getLong(0) == 5L).get.getAs[Long]("n_bigrams") > 0L)
  }

  test("t_tfidf: token-less docs are absent, a one-token doc ranks " +
    "its single term") {
    val tf = SparkEntry.queries("t_tfidf")(spark, dir).collect()
    assert(!tf.exists(_.getLong(0) == 1L), "no tokens → no terms")
    assert(tf.count(_.getLong(0) == 2L) === 1)
  }

  test("bandArrayCol: empty token set yields zero bands, not md5('')") {
    import spark.implicits._
    val b = Seq((1L, ""), (2L, "   "), (3L, "some words here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(Dedup.bandArrayCol).as("bs"))
    assert(b.filter(col("doc_id") < 3L).count() === 0)
    assert(b.filter(col("doc_id") === 3L).count() ===
      Dedup.NumHashes / Dedup.BandRows)
  }
}
