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
}
