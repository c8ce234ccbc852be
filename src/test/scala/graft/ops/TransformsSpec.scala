package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("firstNonBlank: blank-string cases from the app-name fallback chain") {
    // (full_name, aditional_info, app_name) — dlt_fetch_timecamp.py:136-148
    val df = Seq(
      ("Full", "Extra", "app.exe"),
      ("", "Extra", "app.exe"),
      ("  ", null, "app.exe"),
      (null, "", ""),
      (null: String, null: String, null: String)
    ).toDF("full_name", "aditional_info", "app_name")
    val out = df.select(Transforms.firstNonBlank(lit("unknown"),
      $"full_name", $"aditional_info", $"app_name").as("n")).as[String].collect()
    assert(out.toSeq == Seq("Full", "Extra", "app.exe", "unknown", "unknown"))
  }

  test("normalizeParent: NULL/''/'0' all become NULL") {
    val df = Seq("0", "", null, "5").toDF("p")
    val out = df.select(Transforms.normalizeParent($"p").as("p"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq(null, null, null, "5"))
  }

  test("parseDateMulti: all five reference formats plus garbage→null") {
    val df = Seq("2024-03-05", "05/03/2024", "03-05-2024", "not a date")
      .toDF("d")
    val out = df.select(Transforms.parseDateMulti($"d").cast("string").as("p"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) == "2024-03-05")
    assert(out(1) == "2024-03-05") // dd/MM wins over MM/dd (chain order)
    assert(out(2) == "2024-05-03") // dd-MM-yyyy wins over MM-dd-yyyy (chain order)
    assert(out(3) == null)
  }

  test("decodeMap falls back to default") {
    val df = Seq("1", "99").toDF("k")
    val out = Transforms.decodeMap(df, "k", Seq("1" -> "one"), "v", "No category")
      .orderBy("k").select("v").as[String].collect()
    assert(out.toSeq == Seq("one", "No category"))
  }

  test("firstPerGroup picks deterministic first row") {
    val df = Seq(("u1", "g2"), ("u1", "g1"), ("u2", "g3"))
      .toDF("user_id", "group_id")
    val out = Transforms.firstPerGroup(df, Seq("user_id"), Seq($"group_id"))
      .orderBy("user_id").select("group_id").as[String].collect()
    assert(out.toSeq == Seq("g1", "g3"))
  }

  test("dedupByPk: duplicates collapse to deterministic survivor") {
    val df = Seq(("1", "b"), ("1", "a"), ("2", "c")).toDF("id", "v")
    val out = Transforms.dedupByPk(df, Seq("id"), Seq($"v"))
      .orderBy("id").select("v").as[String].collect()
    assert(out.toSeq == Seq("a", "c"))
  }

  test("arrayToJsonOrNull: empty and null arrays → null, else JSON") {
    val df = Seq(
      (1, Seq("a", "b")),
      (2, Seq.empty[String])
    ).toDF("id", "tags")
    val out = df.orderBy("id")
      .select(Transforms.arrayToJsonOrNull($"tags").as("j"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) == """["a","b"]""" && out(1) == null)
  }

  test("stripIdPrefix handles u/g dual keying") {
    val df = Seq("u123", "g45", "9").toDF("id")
    val out = df.select(Transforms.stripIdPrefix($"id").as("s")).as[String].collect()
    assert(out.toSeq == Seq("123", "45", "9"))
  }

  test("saltedJoin output equals the plain inner join") {
    // skewed left: key 1 dominates
    val left = (Seq.fill(50)(1) ++ Seq(2, 3, 99)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "row")
    val right = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
    val salted = Transforms.saltedJoin(left, right, Seq("k"), 4)
      .orderBy("row").collect()
    val plain = left.join(right, Seq("k")).orderBy("row").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("approx_count_distinct lands within the advertised error bound") {
    val df = (1 to 10000).map(i => i % 1234).toDF("v")
    val approx = df.select(approx_count_distinct($"v")).as[Long].head()
    assert(math.abs(approx - 1234.0) / 1234.0 < 0.1) // default rsd 5%
  }

  test("approx_percentile stays within rank error of the exact quantile") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val Seq(p50, p95) = df
      .select(expr("approx_percentile(v, array(0.5, 0.95), 1000)"))
      .head().getSeq[Double](0).toSeq
    // accuracy=1000 → rank error ≤ n/1000 = 10 ranks ≈ 10 values here
    assert(math.abs(p50 - 5000.0) <= 15.0)
    assert(math.abs(p95 - 9500.0) <= 15.0)
  }
}
