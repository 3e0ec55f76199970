package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, MultiModal, Similarity, TextAnalysis}
import graft.streaming.JdbcSink

/** Semantics pins for the round-2 operator wave. */
class OperatorsSpec extends SparkSpec {

  test("t_char_gini arithmetic is exact past the BIGINT overflow " +
    "boundary (~3e7 chars)") {
    import spark.implicits._
    // n²·10⁴ = 1.6e19 > Long.MaxValue: the pre-r7 formula silently
    // wrapped here (non-ANSI) while DuckDB errored; the DECIMAL(38,0)
    // path must return the mathematically exact basis points
    val n = 40000000L
    val ssq = 800000000000000L // a plausible Σc² for that length
    val row = Seq((n, ssq)).toDF("n_chars_counted", "sum_sq")
      .select(graft.operators.TextAnalysis.giniBpCol.as("g")).head()
    val exact = ((BigInt(n) * n - ssq) * 10000 / (BigInt(n) * n)).toLong
    assert(row.getLong(0) === exact)
    assert(exact === 5000L, "sanity: Σc²/n² = 0.5 ⇒ gini 5000 bp")
  }

  test("d_simhash: identical token sets get identical signatures") {
    // the corpus has planted near-dups with equal token sets; their
    // simhash (a token-set function) must collide
    val sig = SparkEntry.queries("d_simhash")(spark, sf)
    val nDocs = sig.count()
    val nSigs = sig.select("sim_hi", "sim_lo").distinct().count()
    assert(nDocs === 500)
    assert(nSigs < nDocs, "expected signature collisions from near-dups")
  }

  test("d_simhash_pairs: pairs are symmetric-free and within distance") {
    val p = SparkEntry.queries("d_simhash_pairs")(spark, sf)
    assert(p.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(p.filter(col("hamming") > 8).count() === 0)
    assert(p.count() > 0)
  }

  test("d_embed_dup only reports same-label pairs above threshold") {
    val d = SparkEntry.queries("d_embed_dup")(spark, sf)
    assert(d.filter(col("score_micro") < 350000L).count() === 0)
  }

  test("s_ann_lsh candidates are a subset of brute-force ranking") {
    // every ANN hit must carry the same score the brute-force pass
    // assigns (same kernel), and the probe's own bucket can't be empty
    val ann = SparkEntry.queries("s_ann_lsh")(spark, sf)
    assert(ann.count() > 0)
    val brute = SparkEntry.queries("s_cosine_topk")(spark, sf)
      .select(col("vec_id"), col("score_micro").as("brute_score"))
    val joined = ann.join(brute, "vec_id")
      .filter(col("score_micro") =!= col("brute_score"))
    assert(joined.count() === 0, "ANN scores must match brute kernel")
  }

  test("s_knn_join returns at most k=3 ranked neighbors per probe") {
    val k = SparkEntry.queries("s_knn_join")(spark, sf)
    val over = k.groupBy("query_id").count().filter(col("count") > 3)
    assert(over.count() === 0)
    assert(k.filter(col("rank") > 3).count() === 0)
  }

  test("t_fingerprint: winnow set is much smaller than gram count") {
    val fp = SparkEntry.queries("t_fingerprint")(spark, sf)
    val grams = Tables.documents(spark, sf)
      .select(sum(length(col("text")) - 7)).head().getLong(0)
    assert(fp.count() < grams / 2, "winnowing must compress")
  }

  test("q_asof: last purchase is never after the event") {
    val a = SparkEntry.queries("q_asof")(spark, sf)
    val e = Tables.events(spark, sf)
      .select(col("event_id").as("pid"), col("ts").as("p_ts"))
    val bad = a.filter(col("last_purchase_id").isNotNull)
      .join(e, col("last_purchase_id") === col("pid"))
      .filter(col("p_ts") > col("ts"))
    assert(bad.count() === 0)
  }

  test("q_rollup contains the grand total row") {
    val r = SparkEntry.queries("q_rollup")(spark, sf)
    val total = r.filter(col("r_name").isNull && col("n_name").isNull)
    assert(total.count() === 1)
    assert(total.head().getAs[Long]("n_orders") ===
      Tables.orders(spark, sf).count())
  }

  test("LSH candidate pairs cover high-jaccard near-dups") {
    // docs with identical token sets must land in the same bucket in
    // every band → n_bands = 4
    val lsh = SparkEntry.queries("d_minhash_lsh")(spark, sf)
    assert(lsh.filter(col("n_bands") === Dedup.NumHashes / Dedup.BandRows)
      .count() > 0)
  }

  test("multimodal byte features extract per-partition batch stats") {
    val media = MultiModal.mediaTable(spark, sf)
    val feats = MultiModal.byteFeatures(media)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), expr("octet_length(text)").as("len"))
    val joined = feats.toDF().join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("len"))
    assert(joined.count() === 0, "n_bytes must equal source byte length")
    assert(feats.filter(col("first_byte") < 0).count() === 0)
  }

  test("m_byte_neardup: block-fingerprint banding equals brute-force " +
    "block equality within-cap, and a hot bucket splits bounded") {
    import spark.implicits._
    val B = MultiModal.BlockLen
    // brute: same block slicing, RAW string equality instead of the
    // md5 band join — proves both that md5 banding loses nothing and
    // that the split policy is a no-op on within-cap corpora
    val q = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, CAST(length(text) DIV $B AS INT)),
           |  b -> substring(text, 1 + CAST(b AS INT) * $B, $B))"""
          .stripMargin)).as("s"))
      .filter(length(col("s")) === B)
      .distinct()
    val brute = q.select(col("doc_id").as("doc_a"), col("s"))
      .join(q.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(countDistinct("s").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val got = SparkEntry.queries("m_byte_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === brute, "banded pairs must equal brute block equality")
    assert(got.nonEmpty, "corpus should contain block-level dups")
    // hot bucket: 300 docs sharing ONE identical full block — the
    // bucket (300 > cap 64) splits into ceil(300/64)=5 salted
    // sub-buckets x 2 rounds; one shared bucket, so
    // p = 1-(1-1/5)^2 = 36% of the n(n-1)/2 pairs survives, bounded
    val blockText = ("x" * 70)
    val hot = (0L until 300L).map(i => (i, blockText))
      .toDF("doc_id", "text")
    val kept = graft.operators.MultiModal.byteNearDupPairs(hot)
      .count().toDouble
    val all = 300.0 * 299 / 2
    val p = 1.0 - math.pow(1.0 - 1.0 / 5, 2.0)
    val sd = math.sqrt(all * p * (1 - p))
    assert(math.abs(kept - all * p) <= 5 * sd + 5,
      s"kept $kept vs expected ${all * p} (sd $sd)")
    assert(kept < all * 0.6, "the split must bound the hot bucket")
  }

  test("r_parse_route: dispatch reads metadata.version off the wire, " +
    "and the no-version path has NO metadata key at all") {
    import spark.implicits._
    // the same serialize shape the operator uses: absent metadata must
    // be genuinely absent from the JSON (ref generator drops the key),
    // not present-and-null — from_json must then route it v1
    val wire = Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("event_id", "k")
      .withColumn("json", to_json(struct(
        when(col("k") % 3 === 0, struct(lit("v1.0.0").as("version")))
          .when(col("k") % 3 === 1, struct(lit("v2.0.0").as("version")))
          .as("metadata"),
        col("event_id").as("reporter_id"))))
    val noMeta = wire.filter(col("k") === 2L).head().getAs[String]("json")
    assert(!noMeta.contains("metadata"),
      "missing version must mean a missing key, not a null field")
    val routed = SparkEntry.queries("r_parse_route")(spark, sf)
    assert(routed.filter(col("route") === "v2")
      .filter(col("version") =!= "v2.0.0").count() === 0)
    assert(routed.filter(col("route") === "v1")
      .filter(col("version") =!= "v1.0.0").count() === 0,
      "metadata-less rows must coalesce to the v1 path")
    assert(routed.filter(col("route") === "v2").count() > 0)
  }

  test("multimodal: JDK ImageIO decodes real PNG/JPEG bytes, poison " +
    "rows survive as decoded=false") {
    import spark.implicits._
    def image(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MultiModal.MediaRow(1L, image(8, 5, 0xffffff, "png"), "png", 8, 5),
      MultiModal.MediaRow(2L, image(3, 7, 0x000000, "png"), "png", 3, 7),
      MultiModal.MediaRow(3L, image(16, 16, 0x808080, "jpg"), "jpg", 16, 16),
      MultiModal.MediaRow(4L, Array[Byte](1, 2, 3), "png", 0, 0),
      MultiModal.MediaRow(5L, "not an image".getBytes("UTF-8"), "wav", 0, 0))
    val feats = MultiModal.decodeImages(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    // decoded dims must match the metadata the row carries
    assert(feats(0).decoded && feats(0).width === 8 && feats(0).height === 5)
    assert(feats(0).mean_luma === 255L, "uniform white decodes to luma 255")
    assert(feats(1).decoded && feats(1).width === 3 && feats(1).height === 7)
    assert(feats(1).mean_luma === 0L, "uniform black decodes to luma 0")
    assert(feats(2).decoded && feats(2).width === 16 && feats(2).height === 16)
    assert(math.abs(feats(2).mean_luma - 128L) <= 4L,
      "lossy JPEG round-trip stays near the encoded grey")
    assert(!feats(3).decoded && feats(3).width === -1,
      "corrupt bytes must mark, not throw")
    assert(!feats(4).decoded, "non-image formats skip the image codec")
  }

  test("multimodal: ImageIO sequence reader decodes a real animated " +
    "GIF; stride samples frames; poison rows mark, not throw") {
    import spark.implicits._
    def animatedGif(lumas: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (v <- lumas) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until w; y <- 0 until h)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close()
      bos.toByteArray
    }
    val gif = animatedGif(Seq(0, 80, 160, 255), 10, 6)
    val rows = Seq(
      MultiModal.MediaRow(1L, gif, "gif", 10, 6),
      MultiModal.MediaRow(2L, Array[Byte](4, 5, 6), "gif", 0, 0),
      MultiModal.MediaRow(3L, gif, "png", 10, 6))
    val all = MultiModal.decodeFrames(spark.createDataset(rows))
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    val frames = all.filter(_.doc_id == 1L)
    assert(frames.length === 4, "every frame of the sequence decodes")
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    assert(frames.forall(f => f.decoded && f.width === 10 && f.height === 6))
    // GIF palettizes but a uniform grey survives (near-)exactly
    for ((f, expected) <- frames.zip(Seq(0L, 80L, 160L, 255L)))
      assert(math.abs(f.mean_luma - expected) <= 3L,
        s"frame ${f.frame_idx}: luma ${f.mean_luma} vs $expected")
    // stride=2 keeps frames 0 and 2 only — I2 sampling on real frames
    val sampled = MultiModal.decodeFrames(spark.createDataset(rows), 2)
      .collect().filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(sampled.map(_.mean_luma).zip(Seq(0L, 160L))
      .forall { case (a, b) => math.abs(a - b) <= 3L })
    // poison bytes and non-gif formats mark decoded=false
    assert(all.filter(_.doc_id == 2L).toSeq
      .forall(f => !f.decoded && f.frame_idx === -1))
    assert(all.filter(_.doc_id == 3L).forall(!_.decoded))
  }

  test("multimodal: scene-change detection — cuts land exactly at " +
    "shot boundaries, windows stay doc-partitioned, poison rows mark") {
    import spark.implicits._
    // an animated GIF whose frames paint per-pixel via `px`
    def texturedGif(frames: Seq[(Int, Int) => Int], w: Int,
        h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (px <- frames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until w; y <- 0 until h) {
          val v = px(x, y) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close()
      bos.toByteArray
    }
    // scene A: left-dark→right-bright gradient (all dHash bits 1);
    // scene B: the reverse (all bits 0) — a full-hash cut between
    val grad: (Int, Int) => Int = (x, _) => x * 255 / 17
    val rev: (Int, Int) => Int = (x, _) => 255 - x * 255 / 17
    val gif = texturedGif(Seq(grad, grad, rev, rev, grad), 18, 8)
    val rows = Seq(
      MultiModal.MediaRow(1L, gif, "gif", 18, 8),
      MultiModal.MediaRow(2L, Array[Byte](9, 9), "gif", 0, 0))
    val hashes = MultiModal.frameDHash(spark.createDataset(rows))
    val scenes = MultiModal.sceneChanges(hashes, maxHamming = 6)
      .orderBy("doc_id", "frame_idx").collect()
    val d1 = scenes.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(1)).toSeq === Seq(0, 1, 2, 3, 4))
    // cuts exactly where the shot changes: frame 0 (opens scene 0),
    // frame 2 (A→B), frame 4 (B→A); within-shot frames are no-cuts
    assert(d1.map(_.getBoolean(3)).toSeq ===
      Seq(true, false, true, false, true))
    assert(d1.map(_.getLong(4)).toSeq === Seq(0L, 0L, 1L, 1L, 2L))
    // within-shot hamming is ~0, across-shot is near the full hash
    assert(d1(1).getLong(2) <= 2 && d1(3).getLong(2) <= 2)
    assert(d1(2).getLong(2) >= 50 && d1(4).getLong(2) >= 50)
    // poison bytes never reach the scene relation
    assert(!scenes.exists(_.getLong(0) == 2L))
    // keyframe sampling: exactly the cut frame of each scene, via the
    // engine's own PerKeyTopK (k=1 per (doc, scene))
    val kf = MultiModal.keyframes(hashes, maxHamming = 6)
      .orderBy("doc_id", "scene_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(kf.toSeq === Seq((1L, 0L, 0), (1L, 1L, 2), (1L, 2L, 4)))
    // scale guard: the one window is doc-partitioned, never global
    val p = MultiModal.sceneChanges(hashes).queryExecution
      .executedPlan.toString
    assert(!p.contains("Window [") ||
      p.contains("windowspecdefinition(doc_id"),
      s"scene windows must partition by doc:\n$p")
  }

  test("multimodal: video near-dup via keyframe-hash sets — a re-paced " +
    "copy matches at 10000 bp, a one-shared-scene video sits at the " +
    "threshold, boilerplate keyframes drop under the cap") {
    def texturedGif(frames: Seq[(Int, Int) => Int], w: Int,
        h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (px <- frames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until w; y <- 0 until h) {
          val v = px(x, y) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close()
      bos.toByteArray
    }
    val grad: (Int, Int) => Int = (x, _) => x * 255 / 17
    val rev: (Int, Int) => Int = (x, _) => 255 - x * 255 / 17
    // wide vertical stripes: survive the 9×8 downscale with
    // alternating neighbor comparisons — a hash distinct from both
    // the all-ones gradient and the all-zeros reverse
    val diag: (Int, Int) => Int = (x, _) => ((x / 3) % 2) * 255
    // A: shots grad|rev|grad; B: the same shots RE-PACED (frames
    // inserted within shots, indexes shifted); D: grad only;
    // E: unrelated texture
    val vids = Seq(
      MultiModal.MediaRow(1L,
        texturedGif(Seq(grad, grad, rev, rev, grad), 18, 8), "gif", 18, 8),
      MultiModal.MediaRow(2L,
        texturedGif(Seq(grad, grad, grad, rev, grad, grad), 18, 8),
        "gif", 18, 8),
      MultiModal.MediaRow(3L,
        texturedGif(Seq(grad, grad), 18, 8), "gif", 18, 8),
      MultiModal.MediaRow(4L,
        texturedGif(Seq(diag, diag), 18, 8), "gif", 18, 8))
    val frames = MultiModal.frameDHash(spark.createDataset(vids)(
      org.apache.spark.sql.Encoders.product[MultiModal.MediaRow]))
    val pairs = MultiModal.videoNearDupPairs(frames)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    // A↔B: identical keyframe sets {grad, rev} → 10000 bp
    assert(pairs.contains((1L, 2L, 2L, 10000L)),
      s"re-paced copy must match exactly, got ${pairs.toSeq}")
    // A↔D and B↔D: one of two keyframes shared → 5000 bp (at gate)
    assert(pairs.contains((1L, 3L, 1L, 5000L)))
    assert(pairs.contains((2L, 3L, 1L, 5000L)))
    // E shares nothing
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // boilerplate cap: the grad keyframe is shared by 3 videos — at
    // maxBucket=2 it drops BEFORE the join, so only A↔B (still
    // sharing rev) survives, with the shared count down to 1
    val capped = MultiModal.videoNearDupPairs(frames, maxBucket = 2,
      minBp = 3000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq === Seq((1L, 2L, 1L)),
      s"over-shared keyframes must drop under the cap, got ${capped.toSeq}")
  }

  test("multimodal: dHash is brightness-invariant and the banded " +
    "pair search finds exactly the near-dup pairs") {
    import spark.implicits._
    // deterministic gradient pattern per seed, optionally brightness-
    // shifted; luma kept in [0, 205] so a +50 shift never clips
    def image(seed: Int, shift: Int): Array[Byte] = {
      val (w, h) = (36, 32)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = ((x * (seed * 7 + 3) + y * (seed * 5 + 1) +
          (x * y * seed) / 4) % 206 + shift).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // doc 2k = pattern k; doc 2k+1 = same pattern +30 brightness —
    // each even/odd pair is the ONLY expected near-dup
    val rows = (0 until 6).flatMap { k =>
      Seq(MultiModal.MediaRow(2L * k, image(k, 0), "png", 36, 32),
        MultiModal.MediaRow(2L * k + 1, image(k, 30), "png", 36, 32))
    } :+ MultiModal.MediaRow(99L, Array[Byte](9, 9), "png", 0, 0)
    val hashes = MultiModal.imageDHash(spark.createDataset(rows))
    val byId = hashes.collect().map(f => f.doc_id -> f).toMap
    assert(!byId(99L).decoded, "poison row must mark, not throw")
    for (k <- 0 until 6)
      assert(byId(2L * k).phash === byId(2L * k + 1).phash,
        s"global brightness shift must not move the dHash (pattern $k)")
    val pairs = MultiModal.imageNearDupPairs(hashes, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 6).map(k => (2L * k, 2L * k + 1)).toSet
    assert((expected -- pairs).isEmpty,
      s"banded search missed shifted twins: ${expected -- pairs}")
    for ((a, b) <- pairs -- expected)
      assert(java.lang.Long.bitCount(byId(a).phash ^ byId(b).phash) <= 6,
        "reported pair violates the hamming bound")
  }

  test("multimodal: javax.sound decodes real WAV headers") {
    import spark.implicits._
    def wav(nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](nFrames * 2)),
        fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MultiModal.MediaRow(1L, wav(4000), "wav", 0, 0),
      MultiModal.MediaRow(2L, "junk".getBytes("UTF-8"), "wav", 0, 0),
      MultiModal.MediaRow(3L, wav(100), "png", 0, 0))
    val feats = MultiModal.decodeAudio(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    assert(feats(0).decoded && feats(0).sample_rate === 8000 &&
      feats(0).channels === 1 && feats(0).n_audio_frames === 4000L)
    assert(!feats(1).decoded, "corrupt bytes must mark, not throw")
    assert(!feats(2).decoded, "non-audio formats skip the audio codec")
  }

  test("multimodal: audio energy fingerprint is volume-invariant and " +
    "the banded pair search finds the re-mastered twins") {
    import spark.implicits._
    // deterministic per-seed segment envelope over 16-bit PCM mono;
    // gainNum/gainDen scales every sample — the re-mastered copy.
    // Amplitudes are even so a half gain divides exactly and the
    // invariance assert is exact, not approximate.
    def wavTone(seed: Int, gainNum: Int, gainDen: Int): Array[Byte] = {
      val n = 6500 // 65 segments × 100 samples
      val pcm = new Array[Byte](n * 2)
      var state = seed * 2654435761L + 1
      val env = Array.tabulate(65) { _ =>
        state = state * 6364136223846793005L + 1442695040888963407L
        ((state >>> 33) % 113 + 8).toInt
      }
      for (i <- 0 until n) {
        val k = i * 65 / n
        val base = env(k) * 100
        val s0 = if (i % 8 < 4) base else -base
        val s = (s0 * gainNum / gainDen).toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // doc 2k = track k; doc 2k+1 = the same track at half volume —
    // each even/odd pair is the ONLY expected near-dup
    val rows = (0 until 5).flatMap { k =>
      Seq(MultiModal.MediaRow(2L * k, wavTone(k, 1, 1), "wav", 0, 0),
        MultiModal.MediaRow(2L * k + 1, wavTone(k, 1, 2), "wav", 0, 0))
    } :+ MultiModal.MediaRow(99L, Array[Byte](1, 2), "wav", 0, 0)
    val hashes = MultiModal.audioFingerprint(spark.createDataset(rows))
    val byId = hashes.collect().map(f => f.doc_id -> f).toMap
    assert(!byId(99L).decoded, "poison bytes must mark, not throw")
    for (k <- 0 until 5)
      assert(byId(2L * k).ahash === byId(2L * k + 1).ahash,
        s"half-volume master must not move the energy hash (track $k)")
    val pairs = MultiModal.audioNearDupPairs(hashes, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 5).map(k => (2L * k, 2L * k + 1)).toSet
    assert((expected -- pairs).isEmpty,
      s"banded search missed re-mastered twins: ${expected -- pairs}")
    for ((a, b) <- pairs -- expected)
      assert(java.lang.Long.bitCount(byId(a).ahash ^ byId(b).ahash) <= 6,
        "reported pair violates the hamming bound")
  }

  test("banded pair search: exact ≤ 3-bit recall (the pigeonhole " +
    "band lemma) and perfect precision vs brute force") {
    import spark.implicits._
    // the honest banding contract over 4×16-bit bands: a pair within
    // Hamming ≤ 3 cannot touch all 4 bands, so the bucket join finds
    // it with CERTAINTY; wider pairs are probabilistic (4+ bits can
    // spread across every band); reported pairs are exact-verified,
    // so nothing outside the threshold ever surfaces
    var st = 987654321L
    def nxt(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
    val base = (0 until 150).map(i => (i.toLong * 2, nxt()))
    // plant a twin with 1..3 flipped bits for every 5th hash —
    // inside the guarantee
    val twins = base.collect { case (id, h) if id % 10 == 0 =>
      val flips = (0 until 1 + (id % 3).toInt)
        .map(k => 1L << (((id * 7 + k * 13) % 64).toInt))
        .foldLeft(0L)(_ | _)
      (id + 1, h ^ flips)
    }
    val all = base ++ twins
    val hashes = all.map { case (id, h) =>
      graft.operators.MultiModal.ImageHash(id, decoded = true, h)
    }
    val got = graft.operators.MultiModal
      .imageNearDupPairs(spark.createDataset(hashes), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteLe3 = (for {
      (a, ha) <- all; (b, hb) <- all if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(bruteLe3.nonEmpty, "the planted twins must exercise the lemma")
    assert((bruteLe3 -- got).isEmpty,
      s"≤3-bit pairs are guaranteed found; missed ${bruteLe3 -- got}")
    // precision: everything reported genuinely meets the threshold
    val hOf = all.toMap
    assert(got.forall { case (a, b) =>
      java.lang.Long.bitCount(hOf(a) ^ hOf(b)) <= 6
    }, "a reported pair violated the exact hamming verify")
  }

  test("compression ratio orders repetitive < prose < random, and " +
    "degenerate docs don't divide by zero") {
    import spark.implicits._
    val rep = Seq.fill(400)("spam").mkString(" ")
    val prose = (0 until 400).map(i =>
      s"word${i % 97} item${(i * 31) % 89} note${(i * 57) % 83}")
      .mkString(" ")
    // deterministic pseudo-random hex — close to incompressible
    var st = 12345L
    val rand = (0 until 400).map { _ =>
      st = st * 6364136223846793005L + 1442695040888963407L
      java.lang.Long.toHexString(st)
    }.mkString(" ")
    val docs = Seq((1L, rep), (2L, prose), (3L, rand), (4L, ""))
      .toDF("doc_id", "text")
    val byId = graft.operators.TextAnalysis.compressRatio(docs)
      .collect().map(c => c.doc_id -> c).toMap
    assert(byId(1L).ratio_bp < byId(2L).ratio_bp,
      "repeated boilerplate must deflate below prose")
    assert(byId(2L).ratio_bp < byId(3L).ratio_bp,
      "structured prose must deflate below random hex")
    assert(byId(3L).ratio_bp > 5000L,
      "random hex should stay near-incompressible")
    assert(byId(1L).ratio_bp < 500L,
      "pure repetition should collapse to a fraction of its size")
    assert(byId(4L).n_bytes === 0L && byId(4L).ratio_bp === 10000L,
      "empty docs carry the neutral ratio, not a division error")
    // full-corpus smoke: every doc gets a ratio in (0, ~10000]
    val corpus = graft.operators.TextAnalysis
      .compressRatio(Tables.documents(spark, sf))
    assert(corpus.filter(col("ratio_bp") <= 0).count() === 0)
  }

  test("multimodal frame sampling chunks binary content") {
    val media = MultiModal.mediaTable(spark, sf).toDF()
    val framed = MultiModal.frameSample(media, 2)
    val bad = framed
      .filter(expr("exists(frames, f -> octet_length(f) > 64)"))
    assert(bad.count() === 0, "no frame may exceed 64 bytes")
    assert(framed.filter(size(col("frames")) === 0).count() === 0)
  }

  test("native cosine kernel is bit-identical to the composed fold") {
    graft.functions.CosineSim.register(spark)
    val e = Tables.embeddings(spark, sf)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    val both = e.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("probe")).as("folded"),
        expr("cosine_sim(embedding, probe)").as("native"))
    // bitwise equality, not approximate: same op order by construction
    assert(both.filter(col("folded") =!= col("native")).count() === 0)
  }

  test("embedding quantizer: degenerate cells are skipped before any " +
    "within-cell join") {
    import spark.implicits._
    // 100 identical vectors → one degenerate cell; 10 varied vectors
    // spread across small cells
    val degenerate = (1L to 100L).map(i => (i, Array.fill(64)(0.5f)))
    val spread = (101L to 110L).map(i =>
      (i, Array.tabulate(64)(d => math.sin(i * 7.0 + d).toFloat)))
    val df = (degenerate ++ spread).toDF("vec_id", "embedding")
    val capped = Similarity.cells(df, maxCell = 16)
    assert(capped.groupBy("bucket").count()
      .filter(col("count") > 16).count() === 0,
      "no surviving cell may exceed the occupancy cap")
    assert(capped.filter(col("vec_id") <= 100L).count() === 0,
      "the degenerate cell must be skipped entirely")
    assert(capped.count() > 0, "non-degenerate cells must survive")
  }

  test("quantizer plane count scales with corpus size and clamps") {
    assert(Similarity.planesFor(500L) === Similarity.NumPlanes)
    assert(Similarity.planesFor(1000000000L) === 20)
    assert(Similarity.planesFor(Long.MaxValue) === 24)
  }

  test("cosine length contract: ragged vectors null out in both the " +
    "native kernel and the composed fold") {
    graft.functions.CosineSim.register(spark)
    val df = spark.sql(
      """SELECT CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>) AS a,
        |       CAST(array(1.0, 2.0) AS ARRAY<FLOAT>) AS b""".stripMargin)
    val r = df.select(
      expr("cosine_sim(a, b)").as("native"),
      Similarity.cosine(col("a"), col("b")).as("folded"),
      expr("cosine_sim(a, a)").as("self")).head()
    assert(r.isNullAt(0), "native kernel must null, not truncate-and-score")
    assert(r.isNullAt(1), "composed fold must null out on ragged input")
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("jdbc sink: options and upsert SQL carry the scale knobs") {
    val o = JdbcSink.options("jdbc:mysql://db/playerdata", "Reports",
      "u", "p")
    assert(o("batchsize") === "1000")
    assert(o("rewriteBatchedStatements") === "true")
    assert(JdbcSink.insertIgnoreSql("Players", Seq("name", "label_id")) ===
      "INSERT IGNORE INTO Players (name, label_id) VALUES (?, ?)")
    val up = JdbcSink.upsertSql("report", Seq("a", "b", "c"), Seq("a"))
    assert(up.contains("ON DUPLICATE KEY UPDATE b = VALUES(b), c = VALUES(c)"))
  }

  test("bandArrayCol ≡ aggregated band rows over the whole corpus") {
    // the map-only per-row band signature (what the streaming gate
    // uses) must be byte-identical to the explode→groupBy form (what
    // the standing index is built from) — same tokens, same per-band
    // seed order, same md5 input string
    val viaExpr = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(Dedup.bandArrayCol).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.band_hash").as("band_hash"))
    val viaAgg = Dedup.bands(spark, sf)
    assert(viaExpr.exceptAll(viaAgg).count() === 0 &&
      viaAgg.exceptAll(viaExpr).count() === 0,
      "map-only band signature diverged from the aggregated form")
  }

  test("t_bpe: merge table matches hand-computed BPE on a known corpus") {
    import spark.implicits._
    // "abab"+"ab": round 1 must merge (a,b) with weight 3 (two
    // occurrences in abab, one in ab), round 2 (ab,ab) weight 1,
    // round 3 finds no pairs and emits nothing
    val docs = Seq("abab", "ab").toDF("text")
    val m = TextAnalysis.bpeMerges(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq(
      (1L, "a", "b", "ab", 3L),
      (2L, "ab", "ab", "abab", 1L)))
  }

  test("t_bpe: overlapping pair occurrences merge left-to-right") {
    import spark.implicits._
    // classic BPE order: "aaa" under merge (a,a) becomes (aa, a),
    // never (a, aa) — and the weight counts non-overlapping
    // occurrences only (2 in "aaa" would double-count the middle)
    val m = TextAnalysis.bpeMerges(Seq("aaa").toDF("text"), 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(m.head === ((1L, "a", "a", "aa", 2L)))
    assert(m(1) === ((2L, "aa", "a", "aaa", 1L)))
  }

  test("t_bpe: merged symbols cannot false-match inside longer symbols") {
    import spark.implicits._
    // after (a,b)→ab, the pair (b,c) must not rewrite "ab c" (the
    // marker-prefix encoding anchors both symbol boundaries); with
    // xb present, (b,c) pairs exist only where b is a whole symbol
    val m = TextAnalysis.bpeMerges(
      Seq("abc", "abc", "bc").toDF("text"), 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // round 1: (a,b) w=2 vs (b,c) w=3 → (b,c) wins
    assert(m.head === ((1L, "b", "c", "bc", 3L)))
    // round 2: remaining pairs: (a,bc) w=2 — NOT (ab,c) or (b,c)
    assert(m(1) === ((2L, "a", "bc", "abc", 2L)))
  }

  test("t_bpe_encode conserves symbols: Σ n_sym = letters − Σ weights") {
    // encode replays the training rewrite exactly (shared replace
    // primitive), and every weighted merge occurrence removes exactly
    // one symbol — so the corpus-wide symbol count after encoding is
    // the initial pre-token character count minus the sum of the
    // merge weights (counted via the SAME pre-tokenizer class)
    val letters = Tables.documents(spark, sf)
      .select(sum(expr(
        "aggregate(regexp_extract_all(lower(text), '" +
          graft.operators.TextAnalysis.BpePretokSparkLit +
          "', 0), 0L, (acc, t) -> acc + length(t))"))
        .cast("long")).head().getLong(0)
    val weights = SparkEntry.queries("t_bpe")(spark, sf)
      .agg(sum("w")).head().getLong(0)
    val nSym = SparkEntry.queries("t_bpe_encode")(spark, sf)
      .agg(sum("n_sym")).head().getLong(0)
    assert(nSym === letters - weights,
      s"symbols $nSym, letters $letters, merge weights $weights")
  }

  test("bpeTrainScalable ≡ the dataflow trainer, bit-identically — " +
    "the parity that lets the 2-job path own production (r12 weak)") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val dataflow = TextAnalysis.bpeMerges(docs, TextAnalysis.BpeRounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val local = TextAnalysis.bpeTrainScalable(docs,
      TextAnalysis.BpeRounds)
    assert(local === dataflow,
      "driver-side trainer must replay the dataflow exactly")
    // and on the hand corpora the dataflow specs pin
    import spark.implicits._
    assert(TextAnalysis.bpeTrainScalable(Seq("aaa").toDF("text"), 2)
      === Seq((1L, "a", "a", "aa", 2L), (2L, "aa", "a", "aaa", 1L)),
      "left-to-right non-overlap + adjacent-pair weights must match")
    assert(TextAnalysis.bpeTrainScalable(
      Seq("abc", "abc", "bc").toDF("text"), 2)
      === Seq((1L, "b", "c", "bc", 3L), (2L, "a", "bc", "abc", 2L)))
  }

  test("BPE pre-tokenizer (r14): digits, punctuation, and non-ASCII " +
    "round-trip — trainer parity and the conservation law hold " +
    "beyond [a-z]") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      "Price: 12,345.67!! call 911 now",
      "snake_case_name == foo123 && bar--",
      "déjà vu naïve café 3.14",
      "12345 12345 ab12 ab12 !!").toDF("text")
    val pretok = s"regexp_extract_all(lower(text), " +
      s"'${TextAnalysis.BpePretokSparkLit}', 0)"
    val toks = docs.select(explode(expr(pretok)).as("t"))
      .collect().map(_.getString(0)).toSeq
    // GPT-style runs: letters, digits, and symbols never mix inside
    // one pre-token; the reserved marker '_' acts as whitespace
    assert(toks.contains("price") && toks.contains("12") &&
      toks.contains("345") && toks.contains("67") && toks.contains("!!"))
    assert(toks.contains("foo") && toks.contains("123"),
      "letter/digit boundary must split foo123")
    assert(toks.contains("déjà") && toks.contains("café"),
      "\\p{L} must cover non-ASCII letters")
    assert(toks.contains("snake") && toks.contains("case") &&
      !toks.exists(_.contains("_")),
      "underscore is the reserved symbol marker, never a token char")
    // trainer parity holds on the widened class
    val dataflow = TextAnalysis.bpeMerges(docs, 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val local = TextAnalysis.bpeTrainScalable(docs, 4)
    assert(local === dataflow,
      "scalable/dataflow parity must survive digits and punctuation")
    assert(local.nonEmpty)
    // conservation law on the widened class: encode with the learned
    // table (the tBpeEncode expression verbatim) — Σ n_sym must equal
    // pre-token characters − Σ merge weights
    val enc0 = array_join(transform(expr(pretok),
      t => regexp_replace(t, "(.)", "_$1")), " ")
    val enc = local.map(t => (t._2, t._3)).foldLeft(enc0) {
      case (c, (l, r)) => replace(c, lit(s"_${l}_$r"), lit(s"_$l$r"))
    }
    val nSym = docs.select(sum(
      (length(enc) - length(replace(enc, lit("_"), lit(""))))
        .cast("long"))).head().getLong(0)
    val units = docs.select(sum(expr(
      s"aggregate($pretok, 0L, (acc, t) -> acc + length(t))"))
      .cast("long")).head().getLong(0)
    assert(nSym === units - local.map(_._5).sum,
      s"symbols $nSym, pre-token chars $units, weights " +
        s"${local.map(_._5).sum}")
  }

  test("bpeTrainScalable at real vocabulary scale: 512 merges cost " +
    "TWO Spark jobs, not 512 — the r12 cost-model contract") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val merges = TextAnalysis.bpeTrainScalable(docs, 512)
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let the async listener bus drain
      // sf0.001's [a-z]+ vocabulary merges dry before 512 — the loop
      // must terminate on its own, well past the oracle's 5 rounds
      assert(merges.length > 50, "corpus must support deep training")
      assert(merges.map(_._1) === (1L to merges.length),
        "merge steps must be dense and ordered")
      // weights never increase against a later EQUAL-pair... they CAN
      // fluctuate across different pairs; pin instead that every
      // merge's weight is positive and the loop terminated on its own
      assert(merges.forall(_._5 > 0))
      // AQE splits the one aggregation into a few stage-jobs; the
      // contract is O(1) — a handful — never O(merges)
      assert(jobs.get <= 8,
        s"512 merges must not launch per-merge jobs, saw ${jobs.get}")
      assert(secs < 60, s"driver loop took ${secs}s")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sample-trained BPE (half the corpus) encodes the full corpus " +
    "within 2% of the full-trained token count — the H8 carve stance " +
    "applied to tokenizer training") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val full = TextAnalysis.bpeTrainScalable(docs, 64)
      .map(t => (t._2, t._3))
    val sampled = TextAnalysis.bpeTrainScalable(docs, 64, sampleMod = 2)
      .map(t => (t._2, t._3))
    assert(sampled.nonEmpty)
    def nSym(merges: Seq[(String, String)]): Long = {
      val enc0 = array_join(transform(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)"),
        t => regexp_replace(t, "(.)", "_$1")), " ")
      val enc = merges.foldLeft(enc0) { case (c, (l, r)) =>
        replace(c, lit(s"_${l}_$r"), lit(s"_$l$r"))
      }
      docs.select(sum(length(enc) - length(replace(enc, lit("_"),
        lit("")))).cast("long")).head().getLong(0)
    }
    val nFull = nSym(full)
    val nSampled = nSym(sampled)
    assert(nSampled <= (nFull * 102) / 100,
      s"sample-trained encode ($nSampled syms) must stay within 2% " +
        s"of full-trained ($nFull syms)")
  }

  test("stripHtml: tags and chrome out, entities decoded in pinned " +
    "order, script '<' does not truncate, whitespace collapsed") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val html = Seq(
      "<html><head><style>p { color: red; }</style></head><body>" +
        "<h1>Title</h1><p>hello   <b>bold</b> world</p>" +
        "<script>if (1 < 2) { alert(\"never shown\"); }</script>" +
        "Q&amp;A &lt;tag&gt; &amp;gt; &copy; 2024&nbsp;Corp</body></html>")
      .toDF("text")
    val got = html.select(TextAnalysis.stripHtml(col("text")).as("t"))
      .head().getString(0)
    assert(got === "Title hello bold world Q&A <tag> &gt; (c) 2024 Corp",
      s"got: $got")
    // the script body (with its naked '<') must be gone entirely
    assert(!got.contains("alert") && !got.contains("color"))
  }

  test("t_epoch_order: a true permutation per epoch, epochs differ, " +
    "re-runs reproduce bit-identically, and no global window plans") {
    val df = SparkEntry.queries("t_epoch_order")(spark, sf)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, sf).count()
    val byEpoch = rows.groupBy(_._2)
    // each epoch is a permutation: every doc exactly once, positions
    // contiguous within the epoch
    assert(byEpoch(1L).map(_._1).toSet === byEpoch(2L).map(_._1).toSet)
    assert(byEpoch(1L).map(_._3).sorted.toSeq === (1L to n))
    assert(byEpoch(2L).map(_._3).sorted.toSeq === (n + 1 to 2 * n))
    // the two epochs order the corpus differently
    val order1 = byEpoch(1L).sortBy(_._3).map(_._1).toSeq
    val order2 = byEpoch(2L).sortBy(_._3).map(_._1).toSeq
    assert(order1 !== order2, "epochs must shuffle differently")
    assert(order1 !== order1.sorted, "epoch order must not be doc_id order")
    // deterministic: a second run reproduces the schedule exactly
    val again = SparkEntry.queries("t_epoch_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
    // scale guard: position assignment must be the partition-offset
    // scheme, never a global window
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "no global window in the training-order plan")
  }

  test("stripMarkdown: links keep labels, emphasis/ticks/headings " +
    "drop, whitespace collapses") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val md = Seq(
      "# Heading\n\nSee [the docs](https://x.y/z) for `code` and " +
        "**bold** and *em* text.\n## Sub\ndone")
      .toDF("text")
    val got = md.select(TextAnalysis.stripMarkdown(col("text")).as("t"))
      .head().getString(0)
    assert(got === "Heading See the docs for code and bold and em " +
      "text. Sub done", s"got: $got")
  }

  test("d_source_overlap_sketch: within the k=16 estimator band of the " +
    "exact token-domain matrix (r15 verdict #7)") {
    val k = Dedup.NumHashes.toDouble
    val sk = SparkEntry.queries("d_source_overlap_sketch")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(sk.nonEmpty, "sketch matrix must be non-empty")
    // exact token-domain ground truth (the sketch's own domain — the
    // word-shingle case the gram-bounded F22 can't cover)
    val st = Tables.documents(spark, sf)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").distinct().cache()
    val tot = st.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inter = st.select(col("source").as("src_a"), col("tok"))
      .join(st.select(col("source").as("src_b"), col("tok")), Seq("tok"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    st.unpersist()
    for (((a, b), (agree, estJbp, estCbp)) <- sk) {
      val (na, nb) = (tot(a).toDouble, tot(b).toDouble)
      val in = inter.getOrElse((a, b), 0L).toDouble
      val j = in / (na + nb - in)
      // k=16 estimator: Ĵ = agree/k, sd = sqrt(J(1-J)/k); pin within
      // 3.5 sd + one-seed granularity (deterministic given md5 —
      // either holds forever or flags a domain/arithmetic bug now)
      val tolJ = 3.5 * math.sqrt(j * (1 - j) / k) + 1.0 / k
      assert(math.abs(agree / k - j) <= tolJ,
        s"($a,$b): est J ${agree / k} vs exact $j exceeds band $tolJ")
      assert(estJbp === agree * 10000 / k.toLong,
        "est_jaccard_bp must be the integer-DIV of the agreement rate")
      // containment derives via |A∩B| = Ĵ/(1+Ĵ)(|A|+|B|); its error is
      // ≤ (na+nb)/na times the J band (dC/dJ = (na+nb)/na · (1+J)⁻²)
      val exactC = in / na
      val tolC = (na + nb) / na * tolJ
      assert(math.abs(estCbp / 10000.0 - exactC) <= tolC,
        s"($a,$b): est containment ${estCbp / 10000.0} vs $exactC " +
          s"exceeds $tolC")
    }
  }

  test("d_edit_dup: deletion-neighborhood recall is exactly brute force " +
    "at edit distance <= 1") {
    // The SymSpell guarantee is the operator's whole contract: the
    // banded candidate join must lose NOTHING against the O(n²)
    // all-pairs levenshtein at the same threshold. The oracle can't
    // prove this (it uses the same candidate scheme); brute force can.
    val got = SparkEntry.queries("d_edit_dup")(spark, sf)
      .select("doc_a", "doc_b", "edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val k = Tables.documents(spark, sf)
      .select(col("doc_id"), expr("substring(lower(trim(text)), 1, 24)")
        .as("k"))
    val brute = k.select(col("doc_id").as("doc_a"), col("k").as("k_a"))
      .crossJoin(k.select(col("doc_id").as("doc_b"), col("k").as("k_b")))
      .filter(col("doc_a") < col("doc_b"))
      .filter(levenshtein(col("k_a"), col("k_b")) <= 1)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("k_a"), col("k_b")).cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute, "candidate scheme must equal brute force")
    assert(got.nonEmpty, "corpus should contain prefix-level dups")
    // depth 2 (SymSpell's standard): the double-deletion neighborhood
    // must ALSO equal brute force at its radius — and strictly
    // contain the depth-1 relation (same pairs, wider net)
    val got2 = SparkEntry.queries("d_edit_dup2")(spark, sf)
      .select("doc_a", "doc_b", "edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute2 = k.select(col("doc_id").as("doc_a"), col("k").as("k_a"))
      .crossJoin(k.select(col("doc_id").as("doc_b"), col("k").as("k_b")))
      .filter(col("doc_a") < col("doc_b"))
      .filter(levenshtein(col("k_a"), col("k_b")) <= 2)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("k_a"), col("k_b")).cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 === brute2, "depth-2 scheme must equal brute force")
    assert(got.subsetOf(got2), "radius 2 is a superset of radius 1")
  }

  test("d_edit_dup hot bucket: an over-cap title bucket splits instead " +
    "of exploding, and bucket-keyed salts compound recall across the " +
    "shared variant buckets") {
    import spark.implicits._
    // 320 docs with the IDENTICAL title key: brute force has n(n-1)/2
    // = 51,040 ED-0 pairs; every variant bucket (320 > MaxBucket=64)
    // splits into ceil(320/64)=5 salted sub-buckets x SplitRounds=2.
    // Each pair shares ALL 25 deletion-variant buckets (the key + 24
    // single deletions), and because the split salt includes the
    // bucket key (r17 advice), the 25 buckets' split verdicts are
    // INDEPENDENT: p = 1-(1-1/5)^(2*25) ~ 99.998% — near-full recall
    // where the old (doc_id, r)-only salt stalled at the
    // single-bucket 36%. The JOIN stays bounded by construction
    // (<= R*n*cap candidate rows per bucket); what decorrelation buys
    // is which pairs the bounded join retains.
    val docs = (0L until 320L).map(i => (i, "the quick brown fox " +
      s"jumps over the lazy dog $i")).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.editDupPairs(docs).count().toDouble
    val all = 320.0 * 319 / 2
    val p = 1.0 - math.pow(1.0 - 1.0 / 5, 2.0 * 25)
    val sd = math.sqrt(all * p * (1 - p))
    assert(math.abs(kept - all * p) <= 5 * sd + 5,
      s"kept $kept vs expected ${all * p} (sd $sd)")
    assert(kept > all * 0.99,
      "cross-bucket decorrelation must recover hot-bucket recall")
    // and a WITHIN-cap corpus keeps every pair (one sub-bucket):
    // "all identical title keys" is exactly 24 chars, so every doc
    // shares the key and differs only past the truncation point
    val small = (0L until 50L)
      .map(i => (i, s"all identical title keys $i"))
      .toDF("doc_id", "text")
    assert(graft.operators.Dedup.editDupPairs(small).count() ===
      50L * 49 / 2, "within-cap buckets are exhaustive")
  }

  test("d_incr_edit: the ingest gate agrees with the full pair relation " +
    "restricted to (new, standing)") {
    // F30-incr's verdicts must be DERIVABLE from F30: a new doc is
    // is_dup iff d_edit_dup links it to some standing doc, and dup_of
    // is the min such partner — the same cross-check d_incr_dedup and
    // d_incr_clusters carry against their batch forms
    val pairs = SparkEntry.queries("d_edit_dup")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a) }
      .filter { case (n, o) => n % 5 == 4 && o % 5 != 4 }
      .groupBy(_._1).map { case (n, os) => n -> os.map(_._2).min }
    val rows = SparkEntry.queries("d_incr_edit")(spark, sf).collect()
    val got = rows.map(r => (r.getLong(0), if (r.isNullAt(3)) None
      else Some(r.getLong(3)), r.getBoolean(4)))
    assert(got.length === 100, "one row per new-batch doc")
    for ((id, dupOf, isDup) <- got) {
      assert(dupOf === expected.get(id),
        s"doc $id: gate says $dupOf, pair relation says ${expected.get(id)}")
      assert(isDup === expected.contains(id))
    }
    assert(expected.nonEmpty, "carve should contain edit-dups")
    // no standing variant bucket exceeds the cap on this corpus, so
    // the F13-style honesty flag must be uniformly false (a true here
    // means the gate EXCLUDED candidates — which would also break the
    // pair-relation agreement above)
    assert(rows.forall(!_.getBoolean(5)), "no capped buckets expected")
  }

  test("d_split_safe: no near-dup cluster straddles a split boundary") {
    val split = SparkEntry.queries("d_split_safe")(spark, sf)
    val straddle = split.groupBy("cluster_rep")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddle === 0, "every cluster must move as one unit")
    // the map's whole point vs H18: the assignment keys on the
    // REPRESENTATIVE, so every member of a cluster carries the rep's
    // hash bucket — pin that the rep is a member-min (F8 contract)
    val bad = split.filter(col("cluster_rep") > col("doc_id")).count()
    assert(bad === 0, "representative must be the cluster min")
    assert(split.count() === 500, "one row per doc, singletons included")
  }

  test("t_sample_weighted: expected-size and always-keep contracts") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long")
          .as("w"))
    val w = docs.select("doc_id", "w").as[(Long, Long)].collect()
    val total = w.map(_._2).sum
    val kParam = 200L
    // expected size = Σ min(1, K·w/W); the draw is a sum of independent
    // Bernoullis, so pin within 5σ (deterministic md5 ⇒ this either
    // holds forever or flags an arithmetic change now)
    val pSum = w.map { case (_, wi) =>
      math.min(1.0, kParam.toDouble * wi / total) }.sum
    val sd = math.sqrt(w.map { case (_, wi) =>
      val p = math.min(1.0, kParam.toDouble * wi / total); p * (1 - p)
    }.sum)
    val sample = SparkEntry.queries("t_sample_weighted")(spark, sf)
    val n = sample.count().toDouble
    assert(math.abs(n - pSum) <= 5 * sd + 1,
      s"sample size $n vs expected $pSum (sd $sd)")
    // docs whose K·w >= W must ALWAYS be kept (the min(1,·) branch)
    val must = w.filter { case (_, wi) => kParam * wi >= total }
      .map(_._1).toSet
    if (must.nonEmpty) {
      val got = sample.select("doc_id").as[Long].collect().toSet
      assert(must.subsetOf(got), "p=1 docs missing from the sample")
    }
  }
}
