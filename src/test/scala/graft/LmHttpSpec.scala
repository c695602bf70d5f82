package graft

import graft.query.LmStage
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** LmStage.scoreBatched against a LIVE localhost HTTP service (the JDK's
  * built-in HttpServer) through the real [[LmStage.HttpBatchScorer]]
  * client — closing the round-3 gap that every end-to-end LM path ran
  * `mockScorer`. Proves, under a real transport: per-partition client
  * init, batch POST round-trips, clamp-to-[0,1] of service outputs,
  * flaky-service recovery within the retry budget, 5xx / timeout
  * exhaustion → 0.0 (never a failure), and that empty docs are answered
  * locally without a service call. */
class LmHttpSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private var server: com.sun.net.httpserver.HttpServer = _
  private var port: Int = _
  private val calls = new AtomicInteger(0)
  private val failFirst = new AtomicInteger(0) // /flaky: 500s remaining

  /** Deterministic service scoring: each doc scores 0.1·(len mod 13);
    * docs containing "big" score 1.7 (exercises the stage's clamp); docs
    * containing "slow" make the request sleep past the client deadline. */
  private def scoresFor(body: String): Seq[Double] = {
    val docs = """"doc":"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    if (docs.exists(_.contains("slow"))) Thread.sleep(5000)
    docs.map(d => if (d.contains("big")) 1.7 else 0.1 * (d.length % 13))
  }

  override def beforeAll(): Unit = {
    server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    def handler(alwaysFail: Boolean) = new com.sun.net.httpserver.HttpHandler {
      def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        calls.incrementAndGet()
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        if (alwaysFail) respond(ex, 503, """{"error":"down"}""")
        else if (failFirst.getAndDecrement() > 0) respond(ex, 500, """{"error":"transient"}""")
        else respond(ex, 200,
          scoresFor(body).mkString("""{"scores":[""", ",", "]}"))
      }
    }
    failFirst.set(0)
    server.createContext("/score", handler(alwaysFail = false))
    server.createContext("/down", handler(alwaysFail = true))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def url(path: String) = s"http://127.0.0.1:$port$path"
  private def df(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
  private def run(d: org.apache.spark.sql.DataFrame, path: String,
                  timeoutMs: Long = 1500): Map[Long, Double] =
    LmStage.scoreBatched(d, "doc_id", "text", "q",
        new LmStage.HttpBatchScorer(url(path), timeoutMs), batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("live service round-trip: batch POST, positional scores, clamp to [0,1]") {
    val out = run(df(1L -> "abcd", 2L -> "a big doc", 3L -> "xy"), "/score")
    assert(approxEq(out(1L), 0.1 * 4))
    assert(out(2L) == 1.0, "service said 1.7; the stage must clamp to 1.0")
    assert(approxEq(out(3L), 0.1 * 2))
  }

  test("empty docs are answered locally — the service never sees them") {
    val before = calls.get()
    val out = run(df(1L -> "", 2L -> "   "), "/score")
    assert(out == Map(1L -> 0.0, 2L -> 0.0))
    assert(calls.get() == before, "no HTTP call may happen for empty docs")
  }

  test("a transiently failing service recovers within the retry budget") {
    failFirst.set(1) // first POST → 500, retry → 200
    val out = run(df(10L -> "abcdefg"), "/score")
    assert(approxEq(out(10L), 0.1 * 7))
  }

  test("a hard-down service (all 5xx) yields 0.0 for the batch, never a failure") {
    val out = run(df(20L -> "abc", 21L -> "abcd"), "/down")
    assert(out == Map(20L -> 0.0, 21L -> 0.0))
  }

  test("a hung service hits the client deadline and the batch lands at 0.0") {
    val t0 = System.nanoTime()
    val out = run(df(30L -> "slow doc"), "/score", timeoutMs = 300)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out(30L) == 0.0)
    // 1 try + 2 retries ≈ 3 × 300 ms of deadline, far below the 5 s hang
    assert(secs < 4.5, f"timeout path took $secs%.1f s — deadline not enforced")
  }

  private def approxEq(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9
}
