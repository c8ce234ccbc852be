package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns plus a typed metadata struct; decode / feature-extract run as
  * per-partition batch functions.
  *
  * Two codecs plug into one seam: `FakeDecoder` (deterministic
  * pseudo-metadata from byte length — what the DuckDB-oracle queries use,
  * since an oracle can replicate it bit-for-bit) and `ImageIoDecoder`
  * (REAL image decode via the JDK's javax.imageio — png/jpeg/gif/bmp,
  * spec-verified against an actual PNG). Audio/video stay stubbed: the
  * JDK ships no container parsers, and the seam's contract is that ONLY
  * the decode function changes between deployments (a Python
  * `mapInPandas` worker slots into the same place in a PySpark stack).
  *
  * Scale notes: decode is embarrassingly parallel per partition; binary
  * payloads never shuffle (decode before any join/agg, project metadata
  * only); `spark.sql.files.maxPartitionBytes` sizes partitions so a batch
  * of blobs fits executor memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false)))

  val metaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic stand-in for a codec: metadata derived from the payload
    * byte length. A real deployment replaces ONLY this function.
    *
    * The formula is deliberately arithmetic-on-length (not a byte hash):
    * it keeps the decode seam honest — the Spark-side plumbing is
    * identical either way — while letting the DuckDB oracle reproduce the
    * values (`strlen` = UTF-8 byte count) so the multimodal queries get a
    * full rows+schema+hash correctness check instead of rows-only.
    */
  object FakeDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Option[Int], Option[Int], Option[Long]) = {
      if (payload == null || payload.isEmpty) (None, None, None)
      else {
        val n = payload.length
        mediaType match {
          case "image" =>
            (Some(64 + (7 * n) % 1024), Some(64 + (13 * n + 3) % 1024), None)
          case "audio" | "video" =>
            (None, None, Some(1000L + (997L * n) % 600000L))
          case _ => (None, None, None)
        }
      }
    }
  }

  /** REAL image decode: `javax.imageio` (JDK-builtin — png/jpeg/gif/bmp,
    * no external codec libraries) parses the payload and returns
    * (width, height). Returns None for null/empty/undecodable bytes and
    * for media ImageIO has no reader for — the caller maps that to NULL
    * metadata, the honest answer for a corrupt blob in a 100 TB crawl
    * (decode failures are data, not exceptions; a throw would kill the
    * whole partition task).
    */
  object ImageIoDecoder {
    def decode(payload: Array[Byte]): Option[(Int, Int)] =
      if (payload == null || payload.isEmpty) None
      else try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
          .map(img => (img.getWidth, img.getHeight))
      } catch { case _: Exception => None }
  }

  /** Extract typed metadata from a media DataFrame (mediaSchema →
    * metaSchema) via the per-partition decode seam.
    */
  def extractMeta(media: DataFrame): DataFrame =
    extractMetaWith(media, (mt, payload) => FakeDecoder.decode(mt, payload))

  /** [[extractMeta]] with the REAL image codec: image rows decode through
    * [[ImageIoDecoder]] (real width/height, or NULLs for undecodable
    * bytes); audio/video stay on the stub — the JDK ships no audio/video
    * container parsers, and the seam's contract is that ONLY the decode
    * function changes between deployments. The oracle-graded queries keep
    * [[extractMeta]] (deterministic stub, DuckDB-reproducible); this is
    * the drop-in for corpora with actual image bytes, spec-verified
    * against a real PNG in MultimodalSpec.
    */
  def extractMetaImageIo(media: DataFrame): DataFrame =
    extractMetaWith(media, (mt, payload) =>
      if (mt == "image")
        ImageIoDecoder.decode(payload) match {
          case Some((w, h)) => (Some(w), Some(h), None)
          case None => (None, None, None)
        }
      else FakeDecoder.decode(mt, payload))

  /** The decode seam itself: per-partition map, one metadata row per blob;
    * `decode` is the ONLY thing a deployment swaps.
    */
  private def extractMetaWith(
      media: DataFrame,
      decode: (String, Array[Byte]) => (Option[Int], Option[Int], Option[Long])): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload", "media_type").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (w, hgt, dur) = decode(mt, payload)
          Row(id, mt, if (payload == null) 0 else payload.length,
            w.orNull, hgt.orNull, dur.orNull)
        }
      }
    spark.createDataFrame(rdd, metaSchema)
  }

  /** Image resize seam: the real transform (payload → resized payload) is
    * stubbed — the fake emits a deterministic digest-sized payload — but
    * the Spark plumbing (binary in/binary out per partition, metadata
    * updated in lockstep) is the production shape.
    */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    // maxSide <= 0 would compute scale 0.0, clamp every dimension to 1
    // and truncate every payload to one byte — garbage with no error
    require(maxSide > 0, s"maxSide must be positive, got $maxSide")
    val spark = media.sparkSession
    val schema = StructType(mediaSchema.fields :+
      StructField("resized_w", IntegerType, nullable = true) :+
      StructField("resized_h", IntegerType, nullable = true))
    val rdd = media.select("media_id", "payload", "media_type").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (w, h, _) = FakeDecoder.decode(mt, payload)
          if (mt == "image" && w.isDefined && h.isDefined) {
            val scale = math.min(1.0, maxSide.toDouble / math.max(w.get, h.get))
            val (nw, nh) = (math.max(1, (w.get * scale).toInt),
              math.max(1, (h.get * scale).toInt))
            // STUB: a real codec would re-encode; the fake truncates the
            // payload proportionally so output size tracks the resize.
            val out = if (payload == null) null
              else payload.take(math.max(1, (payload.length * scale).toInt))
            Row(id, out, mt, nw, nh)
          } else Row(id, payload, mt, null, null)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Video frame-sampling seam: emits one row per sampled frame offset
    * (every `everyMs` into the fake duration) — the explode-shaped UDTF a
    * real pipeline runs before per-frame feature extraction. Binary
    * payloads stay columnar; only (media_id, frame_ms, frame_payload
    * stub) rows fan out.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    // validate on the DRIVER: everyMs = 0 would throw "step cannot be 0"
    // inside an executor task (opaque stage failure), and a negative
    // step would silently sample zero frames from every video
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_ms", LongType, nullable = false),
      StructField("frame_digest", StringType, nullable = true)))
    val rdd = media.select("media_id", "payload", "media_type").rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (_, _, dur) = FakeDecoder.decode(mt, payload)
          if (mt == "video" && dur.isDefined)
            (0L until dur.get by everyMs).map { ms =>
              // STUB: real codec decodes the frame at `ms`; fake digests it.
              Row(id, ms, java.lang.Long.toHexString(ms * 31 + id))
            }
          else Iterator.empty
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Perceptual difference-hash (dHash) of a decoded image: downscale to
    * a 9×8 grid, integer Rec.601 luminance per cell, bit k =
    * lum(x, y) > lum(x+1, y) over the 8 row-adjacent comparisons of each
    * of 8 rows = one 64-bit signature. The standard property this buys:
    * re-encodes, format changes and mild global edits (brightness, small
    * crops) move few bits, so image NEAR-dup reduces to 64-bit Hamming
    * distance — the exact problem the engine already solves for simhash,
    * and at 8 bytes per image the signature table of a billion-image
    * corpus is ~8 GB.
    *
    * The downscale is an EXPLICIT integer box filter (cell (tx, ty)
    * averages the source rectangle [⌊tx·W/9⌋, ⌊(tx+1)·W/9⌋) ×
    * [⌊ty·H/8⌋, ⌊(ty+1)·H/8⌋), Long channel sums, one floor division),
    * not AWT's `Graphics2D.drawImage` — that rescale's kernel is
    * JDK-implementation-defined, which would pin the bit pattern only
    * per-JVM where a heterogeneous executor fleet needs the SAME bytes
    * to hash to the SAME signature on every node. With the fixed kernel
    * the hash is a pure integer function of the decoded pixel raster,
    * so it is platform-deterministic for lossless formats (PNG/BMP
    * decode to exact pixels; JPEG's IDCT remains decoder-defined).
    * A source dimension smaller than the grid degrades to pixel
    * replication (the `max(x0+1, …)` bound). Strict `>` means a
    * CONSTANT image hashes to 0L (all comparisons false) — flat-color
    * dups collapse to one bucket, which is the desired semantics.
    */
  object DHash {
    /** 1000×-scaled box-averaged luminance grid, row-major `gh × gw`:
      * channel sums accumulate in Long (max 255·W·H per cell — no
      * overflow at any real image size), ONE floor division by the cell
      * pixel count — the shared fleet-deterministic downscale behind
      * [[of]] and [[Multimodal.rasterImages]] (one kernel, so the hash
      * and its verify stage can never disagree on what a cell is).
      */
    private[sources] def lumGrid(
        img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Long] = {
      val sw = img.getWidth; val sh = img.getHeight
      val lum = new Array[Long](gh * gw)
      var ty = 0
      while (ty < gh) {
        val y0 = ty * sh / gh
        val y1 = math.max(y0 + 1, (ty + 1) * sh / gh)
        var tx = 0
        while (tx < gw) {
          val x0 = tx * sw / gw
          val x1 = math.max(x0 + 1, (tx + 1) * sw / gw)
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val px = img.getRGB(x, y)
              rs += (px >> 16) & 0xFF; gs += (px >> 8) & 0xFF; bs += px & 0xFF
              x += 1
            }
            y += 1
          }
          val n = (y1 - y0).toLong * (x1 - x0)
          lum(ty * gw + tx) = (299L * rs + 587L * gs + 114L * bs) / n
          tx += 1
        }
        ty += 1
      }
      lum
    }

    def of(img: java.awt.image.BufferedImage): Long = {
      val w = 9; val h = 8
      val lum = lumGrid(img, w, h)
      var bits = 0L
      var k = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w - 1) {
          if (lum(y * w + x) > lum(y * w + x + 1)) bits |= (1L << k)
          k += 1; x += 1
        }
        y += 1
      }
      bits
    }
  }

  /** Per-image dHash over a media frame: image rows decode through
    * [[ImageIoDecoder]]'s codec (real javax.imageio) and hash through
    * [[DHash]]; non-image rows, undecodable bytes and null payloads get
    * NULL — decode failures are data, not exceptions. Map-side per
    * partition, payloads never shuffle; output is (media_id, dhash).
    *
    * Spec-verified (not oracle-graded): DuckDB cannot decode an image,
    * so like the BPE tokenizer this op is pinned by golden tests — real
    * PNG/BMP bytes built in-test, re-encode invariance, the
    * monotone-row identities (increasing rows → 0L, decreasing → −1L),
    * and brightness-shift near-invariance.
    */
  def dHashImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val rdd = media.select("media_id", "payload", "media_type").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val h: Any =
            if (mt != "image" || payload == null || payload.isEmpty) null
            else try {
              Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload)))
                .map(DHash.of).orNull
            } catch { case _: Exception => null }
          Row(id, h)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Image near-dup pairs: [[dHashImages]] signatures through the SAME
    * Manku exact-cover block banding the simhash corpus path uses
    * ([[graft.ops.Dedup.hash64NearDupPairsBlocked]]) — never all-pairs,
    * identical scale story (the published web-crawl shape). Default
    * hamming ≤ 6 with 8 blocks: re-encodes and mild global edits measure
    * 0–4 bits on the spec fixtures; 6 keeps slack without admitting the
    * ~32-bit distance of unrelated images. NULL-dhash rows (undecodable,
    * non-image) drop before banding.
    */
  def nearDupImagePairs(
      media: DataFrame, maxHamming: Int = 6, blocks: Int = 8): DataFrame =
    graft.ops.Dedup.hash64NearDupPairsBlocked(
      dHashImages(media)
        .where(col("dhash").isNotNull)
        .select(col("media_id").as("_id"), col("dhash").as("_h")),
      maxHamming, blocks)

  /** Per-image `side × side` downscaled luminance raster (1000×-scaled
    * Longs — the [[DHash.lumGrid]] kernel, so the raster and the hash
    * share one deterministic downscale). Non-image/undecodable/null
    * payloads raster to NULL — decode failures are data, not
    * exceptions (the [[dHashImages]] contract). Map-side per partition;
    * payloads never shuffle — only the side²·8-byte rasters leave the
    * scan.
    */
  def rasterImages(media: DataFrame, side: Int): DataFrame = {
    require(side >= 2 && side <= 64,
      s"rasterImages: side in [2, 64], got $side")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("raster", ArrayType(LongType, containsNull = false),
        nullable = true)))
    val rdd = media.select("media_id", "payload", "media_type").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val raster: Any =
            if (mt != "image" || payload == null || payload.isEmpty) null
            else try {
              Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload)))
                .map(img => DHash.lumGrid(img, side, side).toSeq).orNull
            } catch { case _: Exception => null }
          Row(id, raster)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** EXACT-verify stage for image near-dup candidates — the minhash
    * pipeline's exact-Jaccard-verify step applied to the image path
    * (which previously clustered raw banding candidates: measured 846 →
    * 82k false pairs across one 13k → 130k decade at h ≤ 6, SCALE.md).
    * For candidate pairs ONLY, compare mean-centered downscaled-raster
    * MSE and keep pairs with `mse <= maxMse` (gray-level² units).
    * Mean-centering makes the verify brightness-invariant, matching the
    * gradient-based invariance of the dHash that generated the
    * candidates — a +16-brightness twin verifies at ~0 while unrelated
    * images that happen to collide in banding measure hundreds. The
    * default side = 16 matters: at coarser rasters (side 8) two
    * unrelated NOISE fields average toward each other (measured mse 78
    * on the spec fixture — under the gate); 16×16 cells keep unrelated
    * variance an order of magnitude above it.
    * Undecodable/missing rasters DROP the pair (can't verify → keep
    * both docs — the conservative curation direction).
    *
    * Scale shape: candidates are sub-linear in the corpus by the
    * banding's construction; only candidate-TOUCHED media decode
    * (broadcast semi-restriction), decode + downscale run map-side, and
    * what shuffles is (id, side²·8 B raster) rows — never payloads. The
    * pair join is candidate-keyed with the raster side size-dispatched
    * to broadcast.
    *
    * Output: `(id_a, id_b, mse)` — the verified subset of `pairs`.
    */
  def verifyImagePairs(
      media: DataFrame, pairs: DataFrame, side: Int = 16,
      maxMse: Double = 100.0): DataFrame = {
    require(maxMse >= 0, s"verifyImagePairs: maxMse >= 0, got $maxMse")
    val touched = graft.Materialize.checkpoint(
      pairs.select(explode(array(col("id_a"), col("id_b"))).as("media_id"))
        .distinct())
    val sub = media.join(
      graft.ops.Joins.broadcastIfSmall(touched, Some(touched.count())),
      Seq("media_id"), "left_semi")
    val rasters = graft.Materialize.checkpoint(
      rasterImages(sub, side).where(col("raster").isNotNull))
    val nRasters = rasters.count()
    def side2(suffix: String) = graft.ops.Joins.broadcastIfSmall(
      rasters.select(col("media_id").as(s"id_$suffix"),
        col("raster").as(s"_r$suffix")), Some(nRasters))
    val n = lit((side * side).toDouble)
    // centered MSE in one pass over the cell deltas: d_i = (a_i − b_i)
    // in gray levels (the grid is 1000×-scaled), then
    // mse = Σd²/n − (Σd/n)² — algebraically Σ(d − mean d)²/n
    pairs
      .join(side2("a"), Seq("id_a"))
      .join(side2("b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        zip_with(col("_ra"), col("_rb"),
          (x, y) => (x - y).cast("double") / lit(1000.0)).as("_d"))
      .select(col("id_a"), col("id_b"),
        aggregate(col("_d"), lit(0.0d), (acc, x) => acc + x).as("_s1"),
        aggregate(col("_d"), lit(0.0d), (acc, x) => acc + x * x).as("_s2"))
      .select(col("id_a"), col("id_b"),
        round(col("_s2") / n - (col("_s1") / n) * (col("_s1") / n), 6)
          .as("mse"))
      .where(col("mse") <= maxMse)
  }

  /** [[nearDupImagePairs]] with the exact-verify stage composed in — the
    * production image-dedup candidate generator: banding recall, verify
    * precision.
    */
  def nearDupImagePairsVerified(
      media: DataFrame, maxHamming: Int = 6, blocks: Int = 8,
      side: Int = 16, maxMse: Double = 100.0): DataFrame =
    verifyImagePairs(media, nearDupImagePairs(media, maxHamming, blocks),
      side, maxMse)

  /** Build a media table from the documents testdata (text bytes standing
    * in for blobs) — deterministic fixture for specs and queries.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))
}
