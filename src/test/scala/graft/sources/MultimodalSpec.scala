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

  test("fromDocuments builds the opaque-binary media table") {
    import spark.implicits._
    val docs = Seq((0L, "abc"), (1L, "def"), (2L, "ghi")).toDF("doc_id", "text")
    val m = Multimodal.fromDocuments(docs).orderBy("media_id")
    val types = m.select("media_type").as[String].collect()
    assert(types.toSeq == Seq("image", "audio", "video"))
  }
}
