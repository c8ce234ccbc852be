package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches latest right row at-or-before each left row per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for key 20
      (4L, 30L, ts("2024-01-01 10:00:00")) // key with no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 5.0),
      (101L, 10L, ts("2024-01-01 11:00:00"), 7.0),
      (102L, 20L, ts("2024-01-01 09:30:00"), 9.0)
    ).toDF("rid", "user_id", "ts", "v")

    val out = Joins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("rid", "v"), col("rid"))
      .select("event_id", "rid", "v").as[(Long, Option[Long], Option[Double])]
      .collect().map { case (k, r, v) => k -> ((r, v)) }.toMap

    assert(out(1L) === ((Some(100L), Some(5.0))))
    assert(out(2L) === ((Some(101L), Some(7.0))))
    assert(out(3L) === ((None, None)))
    assert(out(4L) === ((None, None)))
  }

  test("asofJoin: equal timestamps match (<=) and ties break to max tiebreak") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (101L, 10L, ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("rid", "user_id", "ts", "v")
    val out = Joins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("rid", "v"), col("rid"))
      .select("rid").as[Long].collect()
    assert(out.toSeq === Seq(101L))
  }

  test("asofJoin: NULL timestamps — right NULL matches nothing, left NULL gets NULL") {
    // a NULL right ts sorts nulls-first and (pre-fix) its payload was
    // carried into EVERY left row of its key
    val left = Seq(
      (1L, 10L, Some(ts("2024-01-01 10:00:00"))),
      (2L, 10L, None: Option[java.sql.Timestamp])
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, None: Option[java.sql.Timestamp], 5.0),
      (101L, 10L, Some(ts("2024-01-01 09:00:00")), 7.0)
    ).toDF("rid", "user_id", "ts", "v")
    val out = Joins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("rid", "v"), col("rid"))
      .select("event_id", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(101L), "real left row must match the real right row")
    assert(out(2L) === None, "a NULL-ts left row has no at-or-before match")
  }

  test("rangeJoinBucketed discriminates at MICROSECOND precision") {
    // b 500µs BEFORE a: a millisecond truncation put both in the same ms
    // and emitted the pair despite rts < ts
    val base = "2024-01-01 10:00:00"
    val left = Seq((1L, 1L, java.sql.Timestamp.valueOf(s"$base.0005")))
      .toDF("lid", "k", "ts")
    val right = Seq(
      (10L, 1L, java.sql.Timestamp.valueOf(s"$base.0001")), // 400µs before
      (11L, 1L, java.sql.Timestamp.valueOf(s"$base.0009"))  // 400µs after
    ).toDF("rid", "k", "rts")
    val out = Joins.rangeJoinBucketed(left, right, Seq("k"), "ts", "rts", 1000L)
      .select("rid").as[Long].collect().toSet
    assert(out === Set(11L),
      s"sub-ms-before row must be excluded, sub-ms-after included: $out")
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    val left = (0 until 50).map(i =>
      (i.toLong, (i % 5).toLong, ts(f"2024-01-01 10:${i % 60}%02d:00")))
      .toDF("lid", "k", "ts")
    val right = (0 until 80).map(i =>
      (i.toLong + 1000, (i % 5).toLong, ts(f"2024-01-01 10:${(i * 7) % 60}%02d:30")))
      .toDF("rid", "k", "rts")
    val win = 600000L // 10 minutes

    val banded = Joins.rangeJoinBucketed(left, right, Seq("k"), "ts", "rts", win)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right, Seq("k"))
      .where(col("rts") >= col("ts") &&
        unix_micros(col("rts")) < unix_micros(col("ts")) + win * 1000)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded === naive)
    assert(banded.nonEmpty)
  }
}
