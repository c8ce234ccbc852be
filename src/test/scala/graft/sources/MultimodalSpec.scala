package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = java.util.Arrays.asList(
      Row(1L, "hello".getBytes("UTF-8"), "image"),
      Row(2L, "world!".getBytes("UTF-8"), "audio"),
      Row(3L, null, "video"),
      Row(4L, "x".getBytes("UTF-8"), "other"))
    spark.createDataFrame(rows, Multimodal.mediaSchema)
  }

  test("extractMeta produces the typed metadata schema") {
    val meta = Multimodal.extractMeta(media)
    assert(meta.schema == Multimodal.metaSchema)
  }

  test("decode is deterministic and type-dispatched") {
    val m1 = Multimodal.extractMeta(media).orderBy("media_id").collect()
    val m2 = Multimodal.extractMeta(media).orderBy("media_id").collect()
    assert(m1.toSeq == m2.toSeq)
    val img = m1(0)
    assert(!img.isNullAt(3) && !img.isNullAt(4) && img.isNullAt(5)) // w,h set
    val aud = m1(1)
    assert(aud.isNullAt(3) && aud.isNullAt(4) && !aud.isNullAt(5)) // duration
    val empty = m1(2)
    assert(empty.getInt(2) == 0 && empty.isNullAt(5)) // null payload
  }

  test("extractMetaImageIo decodes a real PNG through the same seam") {
    // a genuine 37x19 PNG, produced by the JDK encoder in-memory
    val img = new java.awt.image.BufferedImage(
      37, 19, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 5, 0xff8800)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    val png = buf.toByteArray
    assert(Multimodal.ImageIoDecoder.decode(png) === Some((37, 19)))

    val rows = java.util.Arrays.asList(
      Row(1L, png, "image"),
      Row(2L, "not an image at all".getBytes("UTF-8"), "image"), // corrupt
      Row(3L, "blob".getBytes("UTF-8"), "audio")) // non-image → stub path
    val m = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.extractMetaImageIo(m).orderBy("media_id").collect()
    assert(out(0).getInt(3) === 37 && out(0).getInt(4) === 19) // real dims
    assert(out(0).getInt(2) === png.length)
    // corrupt bytes are data, not exceptions: NULL metadata, row survives
    assert(out(1).isNullAt(3) && out(1).isNullAt(4))
    // audio keeps the deterministic stub duration
    assert(!out(2).isNullAt(5))
    // same output schema as the stub path — a true drop-in
    assert(Multimodal.extractMetaImageIo(m).schema === Multimodal.metaSchema)
  }

  test("fromDocuments builds the opaque-binary media table") {
    import spark.implicits._
    val docs = Seq((0L, "abc"), (1L, "def"), (2L, "ghi")).toDF("doc_id", "text")
    val m = Multimodal.fromDocuments(docs).orderBy("media_id")
    val types = m.select("media_type").as[String].collect()
    assert(types.toSeq == Seq("image", "audio", "video"))
  }

  test("resizeImages caps the longer side, leaves non-images untouched") {
    val out = Multimodal.resizeImages(media, maxSide = 32)
      .orderBy("media_id").collect()
    val img = out(0)
    assert(!img.isNullAt(3) && !img.isNullAt(4))
    assert(math.max(img.getInt(3), img.getInt(4)) <= 32)
    assert(out(1).isNullAt(3) && out(1).isNullAt(4)) // audio untouched
  }

  test("sampleFrames emits evenly spaced offsets for payload videos only") {
    import spark.implicits._
    val rows = java.util.Arrays.asList(
      Row(1L, "a video blob".getBytes("UTF-8"), "video"),
      Row(2L, null, "video"), // undecodable → no frames
      Row(3L, "img".getBytes("UTF-8"), "image"))
    val m = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(m, everyMs = 60000L)
    val ids = out.select("media_id").distinct().as[Long].collect()
    assert(ids.toSeq == Seq(1L))
    val frames = out.orderBy("frame_ms").select("frame_ms").as[Long].collect()
    assert(frames.nonEmpty)
    assert(frames.zipWithIndex.forall { case (ms, i) => ms == i * 60000L })
  }

  // ---- perceptual image dedup (dHash) — golden-pinned: DuckDB cannot
  // decode an image, so like BPE these are spec gates, not oracle rows

  private def pngOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf))
    buf.toByteArray
  }

  private def bmpOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", buf))
    buf.toByteArray
  }

  /** 9×8 image whose pixel (x, y) has gray level `g(x)` — already at
    * dHash grid size, so the rescale is identity and bits are
    * hand-derivable from the luminance monotonicity alone.
    */
  private def gradient(g: Int => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = math.max(0, math.min(255, g(x)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("DHash monotone-row identities: increasing rows → 0L, " +
    "decreasing rows → all 64 bits set, constant image → 0L") {
    assert(Multimodal.DHash.of(gradient(x => x * 20)) === 0L)
    assert(Multimodal.DHash.of(gradient(x => 255 - x * 20)) === -1L)
    assert(Multimodal.DHash.of(gradient(_ => 128)) === 0L)
  }

  test("dHash is re-encode invariant (PNG ≡ BMP, identical pixels) and " +
    "near-invariant under a global brightness shift") {
    val base = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until 48; x <- 0 until 64)
      base.setRGB(x, y, rnd.nextInt(1 << 24))
    val brighter = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val px = base.getRGB(x, y)
      def up(c: Int) = math.min(255, c + 16)
      brighter.setRGB(x, y, (up((px >> 16) & 0xFF) << 16) |
        (up((px >> 8) & 0xFF) << 8) | up(px & 0xFF))
    }
    def hOf(bytes: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      Multimodal.DHash.of(img)
    }
    val hPng = hOf(pngOf(base))
    val hBmp = hOf(bmpOf(base))
    assert(hPng === hBmp) // lossless containers, same pixels, same hash
    val hBright = hOf(pngOf(brighter))
    val d = java.lang.Long.bitCount(hPng ^ hBright)
    assert(d <= 6, s"brightness shift moved $d bits") // near-dup range
    // and an unrelated image is FAR: a different random field
    val other = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd2 = new scala.util.Random(99)
    for (y <- 0 until 48; x <- 0 until 64)
      other.setRGB(x, y, rnd2.nextInt(1 << 24))
    val dFar = java.lang.Long.bitCount(hPng ^ hOf(pngOf(other)))
    assert(dFar > 6, s"unrelated images measured only $dFar bits apart")
  }

  test("dHashImages: image rows hash, corrupt/non-image/null rows get " +
    "NULL; nearDupImagePairs finds the re-encode and the brightness " +
    "twin but not the unrelated image") {
    val base = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until 48; x <- 0 until 64)
      base.setRGB(x, y, rnd.nextInt(1 << 24))
    val brighter = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val px = base.getRGB(x, y)
      def up(c: Int) = math.min(255, c + 16)
      brighter.setRGB(x, y, (up((px >> 16) & 0xFF) << 16) |
        (up((px >> 8) & 0xFF) << 8) | up(px & 0xFF))
    }
    val other = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd2 = new scala.util.Random(99)
    for (y <- 0 until 48; x <- 0 until 64)
      other.setRGB(x, y, rnd2.nextInt(1 << 24))
    val rows = java.util.Arrays.asList(
      Row(1L, pngOf(base), "image"),
      Row(2L, bmpOf(base), "image"),     // re-encode: hamming 0
      Row(3L, pngOf(brighter), "image"), // near-dup: small hamming
      Row(4L, pngOf(other), "image"),    // unrelated: far
      Row(5L, "corrupt".getBytes("UTF-8"), "image"),
      Row(6L, pngOf(base), "audio"),     // non-image: no decode
      Row(7L, null, "image"))
    val m = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val hashed = Multimodal.dHashImages(m).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashed(1L).isDefined && hashed(1L) == hashed(2L))
    assert(hashed(5L).isEmpty && hashed(6L).isEmpty && hashed(7L).isEmpty)
    val pairs = Multimodal.nearDupImagePairs(m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("verifyImagePairs: re-encode verifies at mse 0, a brightness " +
    "twin verifies near 0 (mean-centered), unrelated images measure far " +
    "above the gate, undecodable candidates drop — and the verified " +
    "generator composes banding recall with verify precision") {
    val base = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until 48; x <- 0 until 64)
      base.setRGB(x, y, rnd.nextInt(1 << 24))
    val brighter = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val px = base.getRGB(x, y)
      def up(c: Int) = math.min(255, c + 16)
      brighter.setRGB(x, y, (up((px >> 16) & 0xFF) << 16) |
        (up((px >> 8) & 0xFF) << 8) | up(px & 0xFF))
    }
    val other = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd2 = new scala.util.Random(99)
    for (y <- 0 until 48; x <- 0 until 64)
      other.setRGB(x, y, rnd2.nextInt(1 << 24))
    val rows = java.util.Arrays.asList(
      Row(1L, pngOf(base), "image"),
      Row(2L, bmpOf(base), "image"),
      Row(3L, pngOf(brighter), "image"),
      Row(4L, pngOf(other), "image"),
      Row(5L, "corrupt".getBytes("UTF-8"), "image"))
    val m = spark.createDataFrame(rows, Multimodal.mediaSchema)
    // hand-planted candidate set: true pairs, a false (banding-fluke
    // stand-in) pair, and a pair with an undecodable side
    val cands = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, 2L), Row(1L, 3L), Row(1L, 4L), Row(1L, 5L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id_a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("id_b",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val verified = Multimodal.verifyImagePairs(m, cands)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(verified.keySet === Set((1L, 2L), (1L, 3L)),
      s"verify must keep true twins only: $verified")
    assert(verified((1L, 2L)) === 0.0, "re-encode: identical pixels")
    assert(verified((1L, 3L)) < 20.0,
      s"brightness twin must center away: ${verified((1L, 3L))}")
    // the unrelated pair's mse is far above the default gate (measured
    // directly with the gate open)
    val open = Multimodal.verifyImagePairs(m, cands, maxMse = 1e9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(open((1L, 4L)) > 100.0,
      s"unrelated images must not verify: ${open((1L, 4L))}")
    assert(!open.contains((1L, 5L)), "undecodable side drops the pair")
    // the composed generator: same candidates as the unverified path
    // minus everything the verify rejects
    val composed = Multimodal.nearDupImagePairsVerified(m)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(composed === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"verified generator keeps the twin family only: $composed")
  }
}
