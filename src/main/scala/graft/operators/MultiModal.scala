package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal columns (SURVEY §2 I): media as opaque `binary` with a
  * typed metadata struct.
  *
  * Decode is REAL for the formats the JDK itself codecs — PNG/JPEG
  * via `javax.imageio.ImageIO` ([[decodeImages]]) and WAV via
  * `javax.sound.sampled.AudioSystem` ([[decodeAudio]]) — no external
  * codec libraries needed. Formats with no in-JVM codec (video) go
  * through the codec-independent byte-statistics path
  * ([[byteFeatures]]) that any FFI decoder would slot into.
  *
  * Scale shape: every decoder is `mapPartitions` — per-partition
  * setup (ImageIO's plugin scan, disk-cache opt-out) runs once per
  * partition, not per row; binary columns never shuffle (all derived
  * features are computed before any wide op); a corrupt blob yields a
  * `decoded=false` row instead of a thrown task — at 100 TB a corpus
  * ALWAYS contains poison rows, and one must not kill a stage.
  */
object MultiModal {

  /** A media row: content bytes + typed metadata, synthesized from
    * documents (text bytes stand in for an encoded frame).
    */
  final case class MediaRow(doc_id: Long, content: Array[Byte],
      format: String, width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      byte_sum: Long, first_byte: Int, n_frames: Int)

  /** Decoded image features: dims from the REAL pixel raster plus an
    * exact integer mean luma (sum of per-pixel (r+g+b)/3, divided
    * once at the end). `decoded=false` (dims -1) marks undecodable
    * bytes or non-image formats.
    */
  final case class ImageFeatures(doc_id: Long, format: String,
      decoded: Boolean, width: Int, height: Int, mean_luma: Long)

  /** Decoded audio features from the container header (WAV): PCM
    * frame count, sample rate, channels. `decoded=false` marks
    * undecodable bytes or non-audio formats.
    */
  final case class AudioFeatures(doc_id: Long, decoded: Boolean,
      sample_rate: Int, channels: Int, n_audio_frames: Long)

  /** Binary media table synthesized from documents. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpg").otherwise("wav")
          .as("format"),
        (lit(64) + (col("doc_id") % 16) * 32).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 9) * 32).cast("int").as("height"))
      .as[MediaRow]
  }

  /** I1a: partition-wise IMAGE decode via JDK ImageIO (PNG/JPEG). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec setup: keep ImageIO off its disk cache
      // (pure in-memory decode) — once per partition, not per row
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val img =
          if (m.format != "png" && m.format != "jpg") None
          else try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.content)))
          catch { case _: java.io.IOException => None }
        img match {
          case Some(i) =>
            val (w, h) = (i.getWidth, i.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = i.getRGB(x, y)
                sum += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) +
                  (rgb & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            ImageFeatures(m.doc_id, m.format, decoded = true, w, h,
              sum / (w.toLong * h))
          case None =>
            ImageFeatures(m.doc_id, m.format, decoded = false, -1, -1, -1L)
        }
      }
    }
  }

  /** I1b: partition-wise AUDIO header decode via javax.sound (WAV). */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val fmt =
          if (m.format != "wav") None
          else try {
            val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(m.content))
            Some((aff.getFormat, aff.getFrameLength.toLong))
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        fmt match {
          case Some((f, frames)) =>
            AudioFeatures(m.doc_id, decoded = true,
              f.getSampleRate.toInt, f.getChannels, frames)
          case None =>
            AudioFeatures(m.doc_id, decoded = false, -1, -1, -1L)
        }
      }
    }
  }

  /** I1c: codec-independent byte statistics — the opaque-binary path
    * for formats with no in-JVM codec (video); an FFI decoder slots
    * into this same partition-wise shape.
    */
  def byteFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val bytes = m.content
        MediaFeatures(
          doc_id = m.doc_id,
          n_bytes = bytes.length.toLong,
          byte_sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)),
          first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
          n_frames = 1 + (bytes.length / 64))
      }
    }
  }

  /** I2: frame sampling — split content into fixed 64-byte "frames"
    * and keep every `stride`-th one (binary → array<binary>).
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("frames",
      expr(s"""filter(
        transform(sequence(0, CAST(octet_length(content) DIV 64 AS INT)),
          i -> substring(content, i * 64 + 1, 64)),
        (x, i) -> i % $stride = 0 AND octet_length(x) > 0)"""))

  /** One decoded frame of a multi-frame container. `decoded=false`
    * (idx/dims -1) marks undecodable bytes, as in [[ImageFeatures]].
    */
  final case class FrameFeatures(doc_id: Long, decoded: Boolean,
      frame_idx: Int, width: Int, height: Int, mean_luma: Long)

  /** Exact integer mean luma of a decoded raster (sum of per-pixel
    * (r+g+b)/3, divided once) — shared by the single- and multi-frame
    * decoders.
    */
  private def meanLuma(i: java.awt.image.BufferedImage): Long = {
    val (w, h) = (i.getWidth, i.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = i.getRGB(x, y)
        sum += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    sum / (w.toLong * h)
  }

  /** I2b: MULTI-frame decode + sampling in one pass — ImageIO's
    * sequence reader over the animated format the JDK itself codecs
    * (GIF), emitting one feature row per kept frame. `stride` IS the
    * I2 frame sampler applied at decode time: frames the stride skips
    * are never rasterized (the reader seeks past them), so sampling
    * cost scales with kept frames, not container length. Same
    * partition-aware shape and poison-row contract as [[decodeImages]]:
    * codec setup once per partition, undecodable bytes → one
    * `decoded=false` row, never a thrown task.
    */
  def decodeFrames(media: Dataset[MediaRow],
      stride: Int = 1): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        val out = scala.collection.mutable.ArrayBuffer.empty[FrameFeatures]
        if (m.format == "gif") {
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(m.content))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              try {
                r.setInput(iis, false, true)
                val n = r.getNumImages(true)
                var i = 0
                while (i < n) {
                  if (i % stride == 0) {
                    val img = r.read(i)
                    out += FrameFeatures(m.doc_id, decoded = true, i,
                      img.getWidth, img.getHeight, meanLuma(img))
                  }
                  i += 1
                }
              } finally {
                r.dispose()
                iis.close()
              }
            }
          } catch { case _: java.io.IOException => out.clear() }
        }
        if (out.isEmpty)
          Iterator.single(FrameFeatures(m.doc_id, decoded = false,
            -1, -1, -1, -1L))
        else out.iterator
      }
    }
  }

  /** The 9×8 dHash grid over a decoded raster (the I3a kernel,
    * factored out so single images and per-frame hashing share one
    * definition): area-averaged integer luma cells, each bit a
    * left<right comparison — brightness-shift invariant. Caller
    * guarantees the raster is at least grid-sized.
    */
  private def dHashBits(i: java.awt.image.BufferedImage): Long = {
    val (gw, gh) = (9, 8)
    val (w, h) = (i.getWidth, i.getHeight)
    val sum = Array.ofDim[Long](gh, gw)
    val cnt = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < h) {
      val cy = y * gh / h
      var x = 0
      while (x < w) {
        val cx = x * gw / w
        val rgb = i.getRGB(x, y)
        sum(cy)(cx) += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) +
          (rgb & 0xff)) / 3
        cnt(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var k = 0
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw - 1) {
        if (sum(cy)(cx) / cnt(cy)(cx) <
            sum(cy)(cx + 1) / cnt(cy)(cx + 1)) bits |= 1L << k
        k += 1
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** Decoded doc + its 64-bit perceptual difference-hash. `decoded =
    * false` (phash -1) marks undecodable bytes, as in [[ImageFeatures]].
    */
  final case class ImageHash(doc_id: Long, decoded: Boolean, phash: Long)

  // ---------------------------------------------------------------- I3
  /** I3a: 64-bit difference-hash (dHash) over the REAL decoded raster —
    * the image-side sibling of the text family's SimHash (F4). The
    * decoded pixels are area-averaged onto a 9×8 luma grid (integer
    * sums — deterministic regardless of decode batch order) and each
    * bit records a left<right comparison between horizontally adjacent
    * cells. Comparisons make the hash EXACTLY invariant to global
    * brightness shifts (a constant added to every pixel moves both
    * cell means by that constant — integer division distributes over
    * `delta*count`), and near-identical frames land within a few bits
    * while unrelated images disagree on ~half. Same `mapPartitions`
    * decode shape as I1a: codec setup once per partition, poison rows
    * yield `decoded=false` instead of killing the stage.
    */
  def imageDHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    val (gw, gh) = (9, 8)
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val img =
          if (m.format != "png" && m.format != "jpg") None
          else try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.content)))
          catch { case _: java.io.IOException => None }
        img match {
          case Some(i) if i.getWidth >= gw && i.getHeight >= gh =>
            ImageHash(m.doc_id, decoded = true, dHashBits(i))
          case _ => ImageHash(m.doc_id, decoded = false, -1L)
        }
      }
    }
  }

  /** Banded 64-bit-hash pair search — F4's 16-bit-band trick:
    * candidates come from a bucket equi-join on any shared band,
    * never an n² comparison. Recall contract (pigeonhole over 4
    * bands): a pair within Hamming ≤ 3 CANNOT touch every band, so
    * it is found with certainty — spec-proven against brute force;
    * above 3 differing bits recall is probabilistic (4+ bits can
    * spread across all 4 bands), the standard banding trade-off every
    * LSH pair search makes. Reported pairs are always verified
    * exactly (`bit_count`), so precision is 1 at any threshold.
    * Shared by the image (dHash) and audio (energy hash) near-dup
    * paths. Input needs (doc_id, phash); output (doc_a, doc_b,
    * hamming), doc_a < doc_b, distinct.
    */
  private def bandedHashPairs(h: DataFrame, maxHamming: Int): DataFrame = {
    val banded = h.select(col("doc_id"), col("phash"),
        explode(expr("sequence(0, 3)")).as("band_idx"))
      .withColumn("band_val",
        expr("shiftright(phash, CAST(band_idx * 16 AS INT)) & 65535"))
    banded.alias("a").join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Per-FRAME dHash of an animated container + its frame index —
    * the raster-level sibling of [[decodeFrames]] (same ImageIO
    * sequence reader, same stride-at-decode sampling, same poison-row
    * contract), emitting the I3a perceptual hash per kept frame
    * instead of summary features. Frames smaller than the 9×8 grid
    * mark `decoded=false` (hash undefined), never throw.
    */
  final case class FrameHash(doc_id: Long, decoded: Boolean,
      frame_idx: Int, phash: Long)

  def frameDHash(media: Dataset[MediaRow],
      stride: Int = 1): Dataset[FrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        val out = scala.collection.mutable.ArrayBuffer.empty[FrameHash]
        if (m.format == "gif") {
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(m.content))
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              try {
                r.setInput(iis, false, true)
                val n = r.getNumImages(true)
                var i = 0
                while (i < n) {
                  if (i % stride == 0) {
                    val img = r.read(i)
                    if (img.getWidth >= 9 && img.getHeight >= 8)
                      out += FrameHash(m.doc_id, decoded = true, i,
                        dHashBits(img))
                  }
                  i += 1
                }
              } finally {
                r.dispose()
                iis.close()
              }
            }
          } catch { case _: java.io.IOException => out.clear() }
        }
        if (out.isEmpty)
          Iterator.single(FrameHash(m.doc_id, decoded = false, -1, -1L))
        else out.iterator
      }
    }
  }

  /** I5: SCENE-CHANGE detection over an animated container — the
    * shot-boundary pass every video curation pipeline runs before
    * sampling "one frame per scene" (a stride sampler oversamples
    * static shots and misses short ones; cuts land exactly one
    * keyframe per shot). A cut is a frame whose perceptual distance
    * from its predecessor exceeds `maxHamming` dHash bits — the same
    * banding-free exact Hamming the I3 near-dup verify uses, so the
    * threshold means the same thing in both places. All windows are
    * PARTITIONED BY doc (a container's frames are one key's rows —
    * never a global window); the per-frame hash work happened
    * map-only in [[frameDHash]]. Emits every decoded frame with its
    * `hamming_prev` (null for frame 0), `is_cut` (frame 0 opens
    * scene 0 by definition), and running `scene_idx` — "sample one
    * frame per scene" is then a PerKeyTopK over (doc_id, scene_idx),
    * k=1.
    */
  def sceneChanges(frames: Dataset[FrameHash],
      maxHamming: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frames.toDF().filter(col("decoded"))
      .withColumn("prev", lag(col("phash"), 1).over(w))
      .withColumn("hamming_prev",
        expr("CAST(bit_count(phash ^ prev) AS BIGINT)"))
      .withColumn("is_cut",
        col("prev").isNull || col("hamming_prev") > maxHamming)
      .withColumn("scene_idx",
        sum(when(col("is_cut"), 1L).otherwise(0L)).over(w) - 1)
      .select(col("doc_id"), col("frame_idx"), col("hamming_prev"),
        col("is_cut"), col("scene_idx"))
  }

  /** One KEYFRAME per scene — the composition the scene pass exists
    * for: the cut frame (each scene's first) via the engine's own
    * PerKeyTopK over (doc, scene), k=1 — bounded heaps, no
    * per-container sort, map-side shrink before the one shuffle.
    */
  def keyframes(frames: Dataset[FrameHash],
      maxHamming: Int = 6): DataFrame = {
    graft.plans.TopK.enable(frames.sparkSession)
    graft.plans.TopK.perKey(sceneChanges(frames, maxHamming),
      Seq(col("doc_id"), col("scene_idx")), Seq(col("frame_idx")), 1)
      .select("doc_id", "scene_idx", "frame_idx")
  }

  /** Keyframes WITH their perceptual hash — the per-video scene
    * summary [[videoNearDupPairs]] compares: (doc_id, frame_idx,
    * phash) for each scene's cut frame.
    */
  def keyframeHashes(frames: Dataset[FrameHash],
      maxHamming: Int = 6): DataFrame =
    keyframes(frames, maxHamming)
      .join(frames.toDF().select("doc_id", "frame_idx", "phash"),
        Seq("doc_id", "frame_idx"))

  // ---------------------------------------------------------------- I6
  /** VIDEO near-dup pairs — the modality capstone over I5: two
    * containers are near-duplicates when their KEYFRAME hash SETS
    * overlap. The scene summary is the robustness trick: a re-cut /
    * re-paced copy (frames inserted or dropped WITHIN shots, frame
    * indexes shifted everywhere) keeps the same cut frames, so its
    * keyframe-hash set survives where frame-by-frame alignment
    * breaks. Then the F5/F12 playbook on those sets: exact hash
    * equality is the blocking key (a shared keyframe = candidate — no
    * all-pairs), hashes shared by more than `maxBucket` videos are
    * boilerplate (intro cards, logos, test patterns) and are dropped
    * BEFORE the self-join exactly like F12's over-shared winnowing
    * fingerprints, and the surviving candidates gate on keyframe-set
    * Jaccard ≥ `minBp`. Output one row per unordered pair with the
    * evidence (shared keyframes, both set sizes, jaccard_bp). Scale:
    * join cost ≤ Σ df² over kept hashes, bounded per hash by the cap;
    * set sizes are scenes per video — tiny relations next to the
    * frame mass that never leaves [[frameDHash]]'s map side.
    */
  def videoNearDupPairs(frames: Dataset[FrameHash],
      maxHamming: Int = 6, minBp: Long = 5000L,
      maxBucket: Int = 64): DataFrame = {
    val kh = keyframeHashes(frames, maxHamming)
      .select("doc_id", "phash").distinct().cache()
    val sizes = kh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // hash occupancy via groupBy+join off the cached kh (skew-safe;
    // see Occupancy.attach) — never a phash-partitioned window
    val capped = Occupancy.attach(kh, Seq("phash"), "df")
      .filter(col("df") <= maxBucket)
      .select("doc_id", "phash")
    capped
      .join(capped.select(col("doc_id").as("doc_b"), col("phash")),
        "phash")
      .filter(col("doc_id") < col("doc_b"))
      .groupBy(col("doc_id").as("video_a"), col("doc_b").as("video_b"))
      .agg(count(lit(1)).as("shared_keyframes"))
      .join(sizes.select(col("doc_id").as("video_a"), col("n").as("n_a")),
        "video_a")
      .join(sizes.select(col("doc_id").as("video_b"), col("n").as("n_b")),
        "video_b")
      .withColumn("jaccard_bp", expr(
        "10000 * shared_keyframes DIV (n_a + n_b - shared_keyframes)"))
      .filter(col("jaccard_bp") >= minBp)
      .select("video_a", "video_b", "shared_keyframes", "n_a", "n_b",
        "jaccard_bp")
      .orderBy("video_a", "video_b")
  }

  /** I5-maint: STREAMING keyframe extraction — the F13/G9-maint
    * ingest-gate stance applied to video curation: containers arrive
    * as a stream of [[MediaRow]]s and each micro-batch runs the full
    * batch composition `frameDHash → sceneChanges → keyframes` inside
    * `foreachBatch`, appending one (doc_id, scene_idx, frame_idx) row
    * per scene. ZERO stream state by construction: a container's
    * frames all live inside ITS OWN row's bytes, and every window in
    * the scene pass is doc-partitioned, so no computation ever spans
    * two input rows — whatever micro-batch boundaries the source
    * picks, the streamed result is row-identical to running the batch
    * composition over the same containers (spec-pinned). At 100 TB
    * this is the shape that matters: keyframes land at ingest, the
    * corpus never needs a second decode pass.
    */
  def streamingKeyframes(media: DataFrame, outDir: String, ckDir: String,
      maxHamming: Int = 6)
      : org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        keyframes(frameDHash(batch.as[MediaRow]), maxHamming)
          .write.mode("append").parquet(outDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** I3b: near-duplicate image pairs by banded dHash. */
  def imageNearDupPairs(hashes: Dataset[ImageHash],
      maxHamming: Int = 6): DataFrame =
    bandedHashPairs(hashes.toDF().filter(col("decoded"))
      .select(col("doc_id"), col("phash")), maxHamming)

  final case class AudioHash(doc_id: Long, decoded: Boolean, ahash: Long)

  // ---------------------------------------------------------------- I4
  /** I4a: 64-bit audio fingerprint over REAL decoded PCM — the audio
    * sibling of I3's dHash: the WAV's 16-bit samples are bucketed into
    * 65 equal time segments, each segment's mean absolute amplitude
    * (its energy envelope, exact integer rationals — `sum·cnt`
    * cross-multiplied, never divided) is compared to its neighbor,
    * and each bit records a rises/falls step of the envelope. Like
    * dHash's brightness invariance, the comparisons are EXACTLY
    * invariant to positive volume scaling (c·a < c·b ⇔ a < b), so a
    * re-mastered / gain-normalized copy of a track lands within a few
    * bits while unrelated audio disagrees on ~half. Same
    * `mapPartitions` + poison-row contract as every decoder here;
    * non-PCM-16LE or sub-segment-length audio yields `decoded=false`.
    */
  def audioFingerprint(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    val segs = 65
    media.mapPartitions { rows =>
      rows.map { m =>
        val sig =
          if (m.format != "wav") None
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(m.content))
            try {
              val f = ais.getFormat
              if (f.getSampleSizeInBits != 16 || f.isBigEndian) None
              else {
                val bytes = ais.readAllBytes()
                val n = bytes.length / 2
                if (n < segs) None
                else {
                  val energy = new Array[Long](segs)
                  val cnt = new Array[Long](segs)
                  var i = 0
                  while (i < n) {
                    val s = ((bytes(2 * i + 1) << 8) |
                      (bytes(2 * i) & 0xff)).toShort.toLong
                    val k = (i.toLong * segs / n).toInt
                    energy(k) += math.abs(s)
                    cnt(k) += 1
                    i += 1
                  }
                  var bits = 0L
                  var k = 0
                  while (k < segs - 1) {
                    // mean-energy compare as exact integer rationals
                    if (energy(k) * cnt(k + 1) < energy(k + 1) * cnt(k))
                      bits |= 1L << k
                    k += 1
                  }
                  Some(bits)
                }
              }
            } finally ais.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        sig match {
          case Some(b) => AudioHash(m.doc_id, decoded = true, b)
          case None => AudioHash(m.doc_id, decoded = false, -1L)
        }
      }
    }
  }

  /** I4b: near-duplicate audio pairs by the shared banded search. */
  def audioNearDupPairs(hashes: Dataset[AudioHash],
      maxHamming: Int = 6): DataFrame =
    bandedHashPairs(hashes.toDF().filter(col("decoded"))
      .select(col("doc_id"), col("ahash").as("phash")), maxHamming)

  // ---------------------------------------------------------------- I1
  /** Metadata extraction as an oracle-checked query: byte length and
    * content digest are codec-independent and cross-engine exact.
    */
  val mMeta: Q = Q(
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("octet_length(text)").cast("long").as("byte_len"),
          md5(col("text")).as("content_md5"),
          (lit(64) + (col("doc_id") % 16) * 32).as("width"),
          (lit(64) + (col("doc_id") % 9) * 32).as("height"),
          expr("1 + octet_length(text) DIV 64").cast("long").as("n_frames"))
        .orderBy("doc_id"),
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
      |  md5(text) AS content_md5,
      |  64 + (doc_id % 16) * 32 AS width,
      |  64 + (doc_id % 9) * 32 AS height,
      |  CAST(1 + strlen(text) // 64 AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin)

  // ---------------------------------------------------------------- I7
  /** BYTE-LEVEL NEAR-DUP, oracle-gated (r17 verdict #7 — the I family
    * carried a single oracle row because JDK codecs are not DuckDB-
    * replayable; this row is the pair-search half of the family with
    * the codec factored OUT): content is sliced into fixed
    * [[BlockLen]]-byte blocks (the fixed-size rung below H27's
    * content-defined chunking — the standard first pass of binary
    * dedup), each full block fingerprinted with md5, and documents
    * sharing ≥ 1 identical block ANYWHERE pair up with the count of
    * distinct shared block fingerprints as the similarity (the join
    * is position-FREE, so a copied block is found at any aligned
    * offset). Candidates are exact by construction (equal fingerprint
    * = equal bytes), so this is the banded-pair plan of
    * [[imageNearDupPairs]] with a replayable fingerprint in place of
    * the perceptual one.
    *
    * Skew guard: a boilerplate block (shared header/footer bytes) is
    * a hot bucket, so block buckets carry the engine's
    * SPLIT-DON'T-DROP occupancy policy with bucket-keyed salts — the
    * pair join stays ≤ R·n·cap per bucket, recall compounding across
    * every block a pair shares exactly as the F30 variant buckets.
    * Within-doc repeated blocks collapse first (DISTINCT (doc, h)),
    * so multiplicity never inflates the join. All joins equi-shaped;
    * all arithmetic integer/md5 ⇒ oracle-gated.
    */
  val BlockLen = 64
  val MaxBlockBucket = 64
  val BlockSplitRounds = 2

  private def blkSubSpark: String =
    s"""CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '#',
       |  CAST(r AS STRING), '#', h)), 1, 8),
       |  16, 10) AS BIGINT)
       |  % ((bucket_n + ${MaxBlockBucket - 1}) DIV $MaxBlockBucket)"""
      .stripMargin.replace("\n", " ")

  private def blkSubDuck: String =
    s"""CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
       |  CAST(r AS VARCHAR) || '#' || h),
       |  1, 8) AS BIGINT)
       |  % ((bucket_n + ${MaxBlockBucket - 1}) // $MaxBlockBucket)"""
      .stripMargin.replace("\n", " ")

  /** The block-fingerprint pair relation over an arbitrary
    * (doc_id, text) relation — split out so the spec can drive both
    * a brute-force-equality corpus and a constructed hot-bucket
    * corpus through the exact code the query runs.
    */
  private[graft] def byteNearDupPairs(docs: DataFrame): DataFrame = {
    val blocks = docs
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, CAST(length(text) DIV $BlockLen AS INT)),
           |  b -> substring(text, 1 + CAST(b AS INT) * $BlockLen,
           |                 $BlockLen))""".stripMargin)).as("s"))
      .filter(length(col("s")) === BlockLen)
      .select(col("doc_id"), md5(col("s")).as("h"))
      .distinct()
    // within-cap buckets skip the extra rounds (identical sub-0 rows
    // the distinct erases — Dedup.lshCandidates' r18 treatment)
    val split = Occupancy.attach(blocks, Seq("h"), "bucket_n")
      .withColumn("r", explode(expr(
        s"sequence(0L, IF(bucket_n <= $MaxBlockBucket, 0L, " +
          s"${BlockSplitRounds - 1}L))")))
      .withColumn("sub", expr(blkSubSpark))
      .select("doc_id", "h", "r", "sub")
    split.select(col("doc_id").as("doc_a"), col("h"),
        col("r"), col("sub")).hint("merge")
      .join(split.select(col("doc_id").as("doc_b"), col("h"),
        col("r"), col("sub")).hint("merge"), Seq("h", "r", "sub"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(countDistinct("h").as("n_shared"))
  }

  val mByteNearDup: Q = Q(
    (s, dir) => byteNearDupPairs(
      Tables.documents(s, dir).select("doc_id", "text"))
      .orderBy("doc_a", "doc_b"),
    s"""WITH blk AS (
       |  SELECT DISTINCT doc_id, md5(s) AS h FROM (
       |    SELECT doc_id,
       |      substr(text, 1 + CAST(b AS INT) * $BlockLen, $BlockLen) AS s
       |    FROM (SELECT doc_id, text,
       |            unnest(range(0, length(text) // $BlockLen + 1)) AS b
       |          FROM documents))
       |  WHERE length(s) = $BlockLen),
       |banded AS (
       |  SELECT *, count(*) OVER (PARTITION BY h) AS bucket_n FROM blk),
       |bsplit AS (
       |  SELECT doc_id, h, r, $blkSubDuck AS sub
       |  FROM banded, (SELECT unnest(range($BlockSplitRounds)) AS r) rr)
       |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |  CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared
       |FROM bsplit a JOIN bsplit c
       |  ON a.h = c.h AND a.r = c.r AND a.sub = c.sub
       |  AND a.doc_id < c.doc_id
       |GROUP BY a.doc_id, c.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin)

  val registry: Map[String, Q] = Map(
    "m_meta" -> mMeta,
    "m_byte_neardup" -> mByteNearDup)
}
