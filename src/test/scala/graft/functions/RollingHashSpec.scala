package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(s: String, w: Int): Seq[Long] = {
    // independent per-window recompute, the O(n·w) definition
    val bytes = s.getBytes("UTF-8")
    (0 to bytes.length - w).map { i =>
      bytes.slice(i, i + w).foldLeft(0L)((a, b) =>
        (a * RollingHash.Base + (b & 0xff)) % RollingHash.Mod)
    }
  }

  test("incremental hashes equal the per-window definition") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(RollingHash.hashes(s.getBytes("UTF-8"), 8).toSeq == reference(s, 8))
    assert(RollingHash.hashes(s.getBytes("UTF-8"), 1).toSeq == reference(s, 1))
  }

  test("short input and empty input yield empty arrays") {
    assert(RollingHash.hashes("abc".getBytes, 8).isEmpty)
    assert(RollingHash.hashes(Array.emptyByteArray, 8).isEmpty)
  }

  test("registered SQL function evaluates through codegen") {
    val df = Seq((1L, "hello world, rolling hash"), (2L, "tiny")).toDF("id", "t")
    val out = df.select($"id", expr("rolling_hash(t, 8)").as("h"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == reference("hello world, rolling hash", 8))
    assert(out(1).getSeq[Long](1).isEmpty) // len 4 < window
    // null in → null out (nullIntolerant)
    val n = Seq((3L, null: String)).toDF("id", "t")
      .select(expr("rolling_hash(t, 8)")).collect()
    assert(n(0).isNullAt(0))
  }

  test("same window content at different positions collides (by design)") {
    val df = Seq("abcdefgh--abcdefgh").toDF("t")
      .select(expr("rolling_hash(t, 8)").as("h"))
    val hs = df.head().getSeq[Long](0)
    assert(hs.head == hs.last)
  }
}
