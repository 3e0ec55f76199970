package graft.tools

import org.apache.spark.sql.functions._

import graft.{Settings, Tables}
import graft.operators.Similarity

/** The NON-TOY codebook sweep (r13 verdict #7): the G15 recall table
  * proves the ANN ladder's STRUCTURE at k = 8 on 500 vectors; this
  * tool re-runs the recall/scan-fraction trade-off at production-ish
  * codebook sizes on the ScaleGen sf1 embeddings, so BASELINE.md can
  * record a measured (k, nprobe) operating point instead of a toy
  * one.
  *
  * For each k ∈ {8, 64, 256}: train the label-free Lloyd codebook
  * (the G10/G14 trainer, generalized init), assign the corpus once
  * (map-only literal-codebook argmin — the production expression),
  * then for each nprobe ∈ {1, 2, 4, 8} fetch the probes' nprobe
  * nearest cells by broadcast equi-join, exact-kernel rerank, and
  * score recall@10 against the brute-force truth over NQ probe
  * vectors. `scan_bp` = candidate rows / corpus rows in basis points
  * — the fraction of the corpus a probe touches, the cost the recall
  * buys. One JSON line per (k, nprobe) plus a headline.
  */
object AnnSweep {

  private val NQ = 8
  private val TopK = 10

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/testdata/sf1"
    val ks = Seq(8, 64, 256)
    val nprobes = Seq(1, 2, 4, 8)
    val spark = Settings.fromEnv().buildSession(aqe = true)
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").localCheckpoint(true)
    val n = emb.count()

    // probes: the NQ smallest vec_ids, collected (driver-side micro
    // vectors drive the nearest-cell ranking exactly like ivfCells)
    val probeRows = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("pv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val probesDf = broadcast(
      probeRows.map { case (q, pv) => (q, pv.toSeq) }
        .toSeq.toDF("qid", "pv"))

    // exact integer-micro cosine-ordering score (the engine's kernel
    // semantics restated over the collected probe): dot on micro
    // units, length-normalized ordering via dot² / |a|²|b|² in rational
    // comparison — for the sweep the simpler exact dot/norm ordering
    // of score_micro is replayed with aggregate() on micro vectors.
    def scoreMicro = {
      val em = transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long"))
      val dot = aggregate(zip_with(em, col("pv"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      val na = aggregate(transform(em, a => a * a), lit(0L),
        (acc, x) => acc + x)
      val nb = aggregate(transform(col("pv"), a => a * a), lit(0L),
        (acc, x) => acc + x)
      // integer bp of cosine via floor(dot·10⁴ / sqrt(na)·sqrt(nb)):
      // norms go to double BEFORE the product (their int64 product
      // overflows at dim·micro² scale) — deterministic and
      // ordering-faithful at sweep precision
      floor(dot.cast("double") * 1e4 /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
        .cast("long")
    }

    // brute truth: every (probe, vector) pair scored, top-10 per probe
    val truth = emb.crossJoin(probesDf)
      .filter(col("vec_id") >= NQ)
      .select(col("qid"), col("vec_id"), scoreMicro.as("sc"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("sc").desc, col("vec_id"))))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

    val results = ks.flatMap { k =>
      val t0 = System.nanoTime()
      var cents = Similarity.kmeansInit(spark, sfDir, k)
      for (_ <- 1 to Similarity.KmeansRounds)
        cents = Similarity.kmeansRound(spark, sfDir, cents)
      val trainMs = (System.nanoTime() - t0) / 1000000
      val a0 = System.nanoTime()
      val assigned = emb
        .withColumn("cell", Similarity.ivfCellCol(cents))
        .localCheckpoint(true)
      val assignMs = (System.nanoTime() - a0) / 1000000
      // nearest cells per probe, driver-side (k×dim longs — exactly
      // the literal ranking the probe expression ships)
      def rankedCells(pv: Array[Long]): Seq[Long] =
        cents.map { case (cl, cv) =>
          val d = cv.zip(pv).map { case (c, x) =>
            val diff = x - c; diff * diff
          }.sum
          (d, cl)
        }.sortBy(identity).map(_._2).toSeq
      nprobes.map { np =>
        val probeCells = probeRows.flatMap { case (q, pv) =>
          rankedCells(pv).take(np).map(c => (q, c))
        }.toSeq.toDF("qid", "cell")
        val cand = assigned
          .join(broadcast(probeCells), Seq("cell"))
          .filter(col("vec_id") >= NQ)
        val nCand = cand.count()
        val hits = cand
          .join(broadcast(probesDf), Seq("qid"))
          .select(col("qid"), col("vec_id"), scoreMicro.as("sc"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("sc").desc, col("vec_id"))))
          .filter(col("rn") <= TopK)
          .select("qid", "vec_id").collect()
          .groupBy(_.getLong(0)).view
          .mapValues(_.map(_.getLong(1)).toSet).toMap
        val recallBp = probeRows.map { case (q, _) =>
          val t = truth.getOrElse(q, Set.empty)
          if (t.isEmpty) 10000L
          else hits.getOrElse(q, Set.empty).count(t) * 10000L / t.size
        }.sum / NQ
        val scanBp = nCand * 10000L / (n * NQ)
        println(s"""{"metric":"ann_sweep","k":$k,"nprobe":$np,""" +
          s""""recall_bp":$recallBp,"scan_bp":$scanBp,""" +
          s""""train_ms":$trainMs,"assign_ms":$assignMs,"n":$n}""")
        (k, np, recallBp, scanBp)
      }
    }
    val best = results
      .filter(_._3 >= 9000L)
      .sortBy(r => (r._4, -r._3))
      .headOption.getOrElse(results.maxBy(r => (r._3, -r._4)))
    println(s"""{"metric":"ann_sweep_pick","k":${best._1},""" +
      s""""nprobe":${best._2},"recall_bp":${best._3},""" +
      s""""scan_bp":${best._4}}""")
    spark.stop()
  }
}
