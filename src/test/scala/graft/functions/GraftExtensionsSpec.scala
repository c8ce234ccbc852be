package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._

/** The ops layer resolves graft's native expressions BY NAME
  * (`call_function`), so a session without the extension fails analysis —
  * [[GraftExtensions.register]] is the documented retrofit for library
  * consumers with an already-built session. This spec round-trips that
  * path on a real registry.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("register retrofits a session whose registry lacks the functions") {
    val reg = spark.sessionState.functionRegistry
    val id = new FunctionIdentifier("vec_dot")
    assert(reg.functionExists(id)) // the shared spec session has the extension
    reg.dropFunction(id)
    // re-register in a finally: the session is SHARED across suites, and a
    // failing assert in between would otherwise leave vec_dot unresolvable
    // for every later suite in this JVM (cascading UNRESOLVED_ROUTINE)
    try {
      assert(!reg.functionExists(id))
      // without the function, the ops entry point fails analysis by name
      val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      intercept[org.apache.spark.sql.AnalysisException] {
        df.select(graft.ops.Similarity.dot($"a", $"b")).collect()
      }
      // retrofit restores it — and the result is the native expression's
      GraftExtensions.register(spark)
      assert(reg.functionExists(id))
      val d = df.select(graft.ops.Similarity.dot($"a", $"b").as("d"))
        .as[Double].head()
      assert(d === 11.0)
    } finally GraftExtensions.register(spark)
  }

  test("register is idempotent on a session that already has them") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    val d = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .select(call_function("vec_dot", $"a", $"b")).as[Double].head()
    assert(d === 1.0)
  }
}
