package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Similarity search over the embedding column (SURVEY §2 G).
  *
  * Brute-force cosine top-k is the correctness baseline: one broadcast
  * of the probe vector, a map-only scoring pass (higher-order array
  * functions — no UDF, stays in codegen), and a `limit` that Spark
  * executes as a tree-reduced TakeOrdered — no global sort, no
  * shuffle of the scored rows. That is exactly the 100 TB-safe shape;
  * the LSH/IVF variant (G2, round 2) prunes candidates before this
  * same kernel.
  *
  * Scores are emitted as integer micro-units (round(cos*1e6)): the
  * ~1e-14 cross-engine summation-order noise cannot move a value
  * across a 0.5e-6 rounding boundary, keeping the oracle hash-exact.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  val TopK = 20

  // ---------------------------------------------------------------- G1
  /** Top-k nearest to the vec_id=0 embedding, scored in micro-units,
    * ranked (score desc, vec_id) for a total deterministic order.
    */
  val sCosineTopk: Q = Q(
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), col("label"),
          round(cosine(col("embedding"), col("probe")) * 1000000.0)
            .cast("long").as("score_micro"))
        .orderBy(col("score_micro").desc, col("vec_id"))
        .limit(TopK)
    },
    s"""WITH p AS (SELECT embedding AS probe FROM embeddings
       |           WHERE vec_id = 0),
       |sc AS (
       |  SELECT vec_id, label,
       |    CAST(round(1000000.0 *
       |      list_sum(list_transform(list_zip(embedding, probe),
       |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
       |      (sqrt(list_sum(list_transform(embedding,
       |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |       sqrt(list_sum(list_transform(probe,
       |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS BIGINT)
       |      AS score_micro
       |  FROM embeddings, p WHERE vec_id <> 0)
       |SELECT vec_id, label, score_micro FROM sc
       |ORDER BY score_micro DESC, vec_id LIMIT $TopK""".stripMargin)

  val registry: Map[String, Q] = Map(
    "s_cosine_topk" -> sCosineTopk)
}
