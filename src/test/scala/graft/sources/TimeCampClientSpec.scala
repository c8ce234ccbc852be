package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's own test suite (`tests/test_api.py:19-87`) —
  * retry semantics and batching shapes.
  */
class TimeCampClientSpec extends AnyFunSuite {
  import TimeCampClient._

  private def transcriptTransport(
      responses: Iterator[Response]): (Transport, collection.mutable.Buffer[String]) = {
    val calls = collection.mutable.Buffer.empty[String]
    val t: Transport = (url, _) => { calls += url; responses.next() }
    (t, calls)
  }

  test("retry honors JSON-body retry_after on 502 then succeeds") {
    val (t, calls) = transcriptTransport(Iterator(
      Response(502, """{"retry_after": 60}"""),
      Response(200, "ok")))
    val sleeps = collection.mutable.Buffer.empty[Long]
    val r = get(t, sleeps += _)("/entries", Map())
    assert(r.status == 200 && calls.size == 2)
    assert(sleeps.toSeq == Seq(60000L))
  }

  test("gives up after 5 retryable responses with 4 linear sleeps") {
    val (t, calls) = transcriptTransport(Iterator.continually(Response(503, "")))
    val sleeps = collection.mutable.Buffer.empty[Long]
    val e = intercept[RuntimeException] { get(t, sleeps += _)("/u", Map()) }
    assert(e.getMessage.contains("503"))
    assert(calls.size == 5)
    assert(sleeps.toSeq == Seq(5000L, 10000L, 15000L, 20000L))
  }

  test("400 is not retried") {
    val (t, calls) = transcriptTransport(Iterator.continually(Response(400, "bad")))
    intercept[RuntimeException] { get(t, _ => ())("/u", Map()) }
    assert(calls.size == 1)
  }

  test("Retry-After header wins over body") {
    val (t, _) = transcriptTransport(Iterator(
      Response(429, """{"retry_after": 99}""", retryAfterHeader = Some(7)),
      Response(200, "ok")))
    val sleeps = collection.mutable.Buffer.empty[Long]
    get(t, sleeps += _)("/u", Map())
    assert(sleeps.toSeq == Seq(7000L))
  }

  test("application batches split as [100, 100, 1] for 201 ids") {
    val b = batched((1 to 201).map(_.toString), 100)
    assert(b.map(_.size) == Seq(100, 100, 1))
  }

  test("settings lookups batch 50 per request") {
    assert(batched((1 to 120).map(_.toString), 50).map(_.size) == Seq(50, 50, 20))
  }

  test("activity fan-out: users × ≤20-date chunks") {
    val plan = activityBatches(Seq("u1", "u2"), (1 to 45).map(d => s"2024-01-$d"))
    assert(plan.size == 6) // 2 users × 3 chunks
    assert(plan.map(_._2.size).toSet == Set(20, 20, 5))
  }

  test("failed batches are skipped, run continues") {
    val out = fetchSkippingFailures(Seq(1, 2, 3)) { i =>
      if (i == 2) throw new RuntimeException("boom") else i * 10
    }
    assert(out == Seq(10, 30))
  }
}
