package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observe metrics ride the execution pass and reach the listener") {
    val seen = new ConcurrentLinkedQueue[(Long, Double)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("ingest").foreach { row =>
          seen.add((row.getAs[Long]("n_rows"), row.getAs[Double]("sum_0")))
        }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq((1L, 2.5), (2L, 3.5), (3L, 4.0)).toDF("id", "v")
      val out = Observe.withRowMetrics(df, "ingest", col("v"))
        .where(col("id") > 0)
      assert(out.count() === 3)
      // listener delivery is async — poll with a deadline
      val deadline = System.nanoTime() + 10_000_000_000L
      var m = seen.poll()
      while (m == null && System.nanoTime() < deadline) {
        Thread.sleep(50); m = seen.poll()
      }
      assert(m != null, "expected observed metrics")
      assert(m._1 === 3L)
      assert(m._2 === 10.0)
    } finally spark.listenerManager.unregister(listener)
  }
}
