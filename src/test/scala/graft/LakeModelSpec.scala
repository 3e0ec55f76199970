package graft

import java.nio.file.Files

import scala.util.Random

import graft.sources.LakeMerge

/** Model-based check of the WHOLE lake protocol: random sequences of
  * COW merges (upserts + deletes), merge-on-read key deletes,
  * (scoped, randomly-sized) compactions, RESTOREs to random earlier
  * snapshots, and maintain() sweeps must keep the table row-identical
  * to a trivial in-memory map after EVERY commit — and the version
  * history, change feed, and manifest stats must match what the
  * recorded model states imply. Seeded randomness: the op
  * interleavings (delete-then-compact, compact-then-merge on the same
  * partition, deletes of absent keys, no-op compactions,
  * restore-then-merge, maintain over MOR debt) are exactly the cases
  * example-based specs enumerate one at a time.
  */
class LakeModelSpec extends SparkSpec {

  import spark.implicits._

  type Model = Map[(Long, String), String]

  private def asSet(m: Model): Set[(Long, String, String)] =
    m.map { case ((k, dt), p) => (k, dt, p) }.toSet

  private def readSet(dir: String, v: Option[Int] = None) =
    LakeMerge.read(spark, dir, v).select("k", "dt", "payload")
      .as[(Long, String, String)].collect().toSet

  test("random merge/delete/compact sequences ≡ an in-memory model, " +
    "at every version, through the feed, and after vacuum") {
    val dts = Seq("A", "B", "C")
    for (trial <- 1 to 3) {
      val rnd = new Random(100 + trial)
      val dir = Files.createTempDirectory(s"graft_lakemodel$trial").toString
      var seq = 0L
      // distinct (k, dt) pairs with a payload stamped by (trial, seq)
      def rndKeys(n: Int): List[(Long, String)] =
        List.fill(n)((rnd.nextInt(20).toLong, dts(rnd.nextInt(3)))).distinct
      def stamp(ks: List[(Long, String)]): List[(Long, String, String, Long)] =
        ks.map { case (k, dt) => (k, dt, s"p$trial-$seq-$k-$dt", seq) }

      val init0 = stamp(rndKeys(15))
      LakeMerge.init(spark, dir,
        init0.toDF("k", "dt", "payload", "seq"), "dt", "k", "seq")
      var model: Model = init0.map(r => (r._1, r._2) -> r._3).toMap
      var states = Map(LakeMerge.latestVersion(spark, dir) -> model)

      for (step <- 1 to 14) {
        seq += 1
        rnd.nextInt(7) match {
          case 0 | 1 => // COW merge: upserts + deletes, disjoint keys
            val delK = rndKeys(rnd.nextInt(3))
            val upsK = rndKeys(rnd.nextInt(6) + 1)
              .filterNot(delK.contains)
            val ups = stamp(upsK)
              .map(r => (r._1, r._2, r._3, r._4, LakeMerge.Upsert))
            val dels = delK.map { case (k, dt) =>
              (k, dt, "x", seq, LakeMerge.Delete) }
            LakeMerge.merge(spark, dir,
              (ups ++ dels).toDF("k", "dt", "payload", "seq", "op"),
              Some("op"))
            model = model ++ stamp(upsK).map(r => (r._1, r._2) -> r._3) --
              delK
          case 2 => // merge-on-read delete (absent keys allowed)
            val ks = rndKeys(rnd.nextInt(4) + 1)
            LakeMerge.deleteKeys(spark, dir, ks.toDF("k", "dt"))
            model = model -- ks
          case 3 => // compaction: random file size, random scope
            LakeMerge.compact(spark, dir,
              targetRows = 1L + rnd.nextInt(10),
              keep = dt => rnd.nextBoolean() || dt == "A")
          case 4 => // restore to a random recorded snapshot: the
            // model rewinds with it (data only — later merges build
            // on the restored state)
            val vs0 = states.keys.toList.sorted
            val rv = vs0(rnd.nextInt(vs0.length))
            LakeMerge.restore(spark, dir, rv)
            model = states(rv)
          case 5 => // maintenance sweep: physical-only, model unchanged
            LakeMerge.maintain(spark, dir,
              targetRows = 1L + rnd.nextInt(10),
              maxFilesPerPartition = 1 + rnd.nextInt(4),
              maxLiveDirs = 1 + rnd.nextInt(3))
          case 6 => // checkpoint chaos (r12 verdict: model the
            // checkpoint interleavings too): tear or delete the
            // manifest checkpoint mid-sequence — it is pure CACHE,
            // so every read below and every later commit (which may
            // re-land one) must behave identically to the listing
            // fallback; the step's standing asserts ARE the check
            val f = org.apache.hadoop.fs.FileSystem.getLocal(
              spark.sessionState.newHadoopConf())
            val p = new org.apache.hadoop.fs.Path(
              s"$dir/_manifest/_checkpoint.json")
            if (rnd.nextBoolean()) {
              val o = f.create(p, true)
              o.write("{\"version\": 99, \"ent".getBytes("UTF-8"))
              o.close()
            } else f.delete(p, false)
        }
        val v = LakeMerge.latestVersion(spark, dir)
        states += v -> model
        assert(readSet(dir) === asSet(model),
          s"trial $trial step $step: table diverged from the model")
        // manifest stats stay truthful through every op interleaving
        val stats = LakeMerge.metaStats(spark, dir)
          .select("dt", "n_rows").as[(String, Long)].collect().toMap
        val want = model.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        assert(stats === want,
          s"trial $trial step $step: manifest counts diverged")
      }

      // time travel: every recorded version still reads as its model
      for ((v, m) <- states)
        assert(readSet(dir, Some(v)) === asSet(m),
          s"trial $trial: version $v diverged under time travel")

      // the change feed between two random recorded versions equals
      // the model diff (deletes carry preimages)
      val vs = states.keys.toList.sorted
      assert(vs.length >= 2, s"trial $trial committed too few versions")
      val i1 = rnd.nextInt(vs.length - 1)
      val i2 = i1 + 1 + rnd.nextInt(vs.length - 1 - i1)
      val (v1, v2) = (vs(i1), vs(i2))
      val (m1, m2) = (states(v1), states(v2))
      val expected =
        m2.collect { case (k, p) if !m1.contains(k) =>
          ("insert", k._1, k._2, p) }.toSet ++
        m1.collect { case (k, p) if !m2.contains(k) =>
          ("delete", k._1, k._2, p) }.toSet ++
        m2.collect { case (k, p) if m1.get(k).exists(_ != p) =>
          ("update", k._1, k._2, p) }.toSet
      val feed = LakeMerge.changes(spark, dir, v1, Some(v2))
        .select("_change_type", "k", "dt", "payload")
        .as[(String, Long, String, String)].collect().toSet
      assert(feed === expected,
        s"trial $trial: feed v$v1→v$v2 diverged from the model diff")

      // vacuum to the latest snapshot: still the model
      LakeMerge.vacuum(spark, dir, keepLast = 1)
      assert(readSet(dir) === asSet(model),
        s"trial $trial: table diverged after vacuum")
    }
  }
}
