package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps k best per group, value desc then id asc, across partitions") {
    val df = Seq(
      (1L, 10.0, 100L), (1L, 30.0, 101L), (1L, 20.0, 102L), (1L, 30.0, 103L),
      (2L, 5.0, 200L)
    ).toDF("g", "v", "id").repartition(4)
    val topk = TopKAggregator.topK(3)
    val out = df.groupBy("g").agg(topk(col("v"), col("id")).as("t"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    assert(out(1L) === Seq((30.0, 101L), (30.0, 103L), (20.0, 102L)))
    assert(out(2L) === Seq((5.0, 200L)))
  }

  test("topK agrees with the row_number window formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id")
    val topk = TopKAggregator.topK(3)
    val viaAgg = df.groupBy("g").agg(topk(col("v"), col("id")).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("i", "p")))
      .select(col("g"), col("p._2").as("id"), (col("i") + 1).as("rank"))
      .as[(Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("g"), col("id"), col("rank").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("partial aggregation: physical plan shows map-side partial_topk") {
    val topk = TopKAggregator.topK(2)
    val df = Seq((1L, 1.0, 1L)).toDF("g", "v", "id")
      .groupBy("g").agg(topk(col("v"), col("id")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregator") ||
      plan.toLowerCase.contains("partial"), s"expected partial agg in:\n$plan")
  }

  test("k <= 0 is rejected at construction, not at b.last mid-job") {
    val e = intercept[IllegalArgumentException](new TopKAggregator(0))
    assert(e.getMessage.contains("k >= 1"))
    intercept[IllegalArgumentException](new TopKAggregator(-3))
    ()
  }
}
