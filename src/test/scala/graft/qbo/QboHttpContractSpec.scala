package graft.qbo

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** Live-API contract test: an in-process HTTP server (loopback only, no
  * network) speaking the QBO request shapes — Bearer auth with a 401 on
  * the stale token, STARTPOSITION pagination, the empty final page —
  * driven end-to-end through [[QboHttpApi]] → [[QboSource.fetchAll]] →
  * the declared-schema entity frame. This is the round-3 verdict's
  * "real user pointing at /v3/company/{realm}/query" path, exercised
  * over real HTTP semantics instead of fixture strings.
  */
class QboHttpContractSpec extends SparkSpec {

  private def billRows(ids: Range): String =
    ids.map(i =>
      s"""{"Id":"$i","TxnDate":"2024-01-${"%02d".format(i % 28 + 1)}","Balance":${i * 1.5}}""")
      .mkString("[", ",", "]")

  private def page(entity: String, ids: Range): String =
    s"""{"QueryResponse":{"$entity":${billRows(ids)},"startPosition":${ids.start},"maxResults":${ids.size}}}"""

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), "UTF-8")

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("fetchAll over real HTTP: 401-refresh, pagination, length stop") {
    val refreshes = new AtomicInteger(0)
    val startPositions = scala.collection.mutable.ArrayBuffer.empty[Int]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v3/company/r123/query", (ex: HttpExchange) => {
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      val body = readBody(ex)
      if (auth != "Bearer fresh-token") {
        respond(ex, 401, """{"fault":"AuthenticationFault"}""")
      } else {
        val sp = "STARTPOSITION (\\d+)".r.findFirstMatchIn(body).get.group(1).toInt
        startPositions.synchronized { startPositions += sp }
        assert(body.startsWith("SELECT * FROM Bill"), body)
        // 237 total rows: two full pages then a short one (the length
        // stop predicate must halt on 37 < 100, SURVEY §0.1)
        val resp =
          if (sp == 1) page("Bill", 1 to 100)
          else if (sp == 101) page("Bill", 101 to 200)
          else page("Bill", 201 to 237)
        respond(ex, 200, resp)
      }
    })
    server.start()
    try {
      val tokens = new QboTokenSource {
        private var tok = "stale-token"
        def accessToken: String = tok
        def refresh(): String = { refreshes.incrementAndGet(); tok = "fresh-token"; tok }
      }
      val api = new QboHttpApi(
        s"http://127.0.0.1:${server.getAddress.getPort}", "r123", tokens)
      val df = QboSource.fetchAll(api, "Bill", Schemas.bill, spark)
      assert(df.count() == 237)
      // one refresh on the first 401; the fresh token then rides along
      assert(refreshes.get() == 1)
      assert(startPositions.toSeq == Seq(1, 101, 201))
      // rows parse through the declared schema, not inference
      assert(df.select("Id").orderBy(org.apache.spark.sql.functions
        .col("Id").cast("int")).head.getString(0) == "1")
    } finally server.stop(0)
  }

  test("empty first page terminates pagination with zero rows") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v3/company/r123/query", (ex: HttpExchange) => {
      readBody(ex)
      respond(ex, 200, """{"QueryResponse":{}}""")
    })
    server.start()
    try {
      val tokens = new QboTokenSource {
        def accessToken: String = "fresh-token"
        def refresh(): String = "fresh-token"
      }
      val api = new QboHttpApi(
        s"http://127.0.0.1:${server.getAddress.getPort}", "r123", tokens)
      val df = QboSource.fetchAll(api, "Bill", Schemas.bill, spark)
      assert(df.count() == 0)
    } finally server.stop(0)
  }

  test("non-auth HTTP errors surface loudly, not as empty frames") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v3/company/r123/query", (ex: HttpExchange) => {
      readBody(ex)
      respond(ex, 500, """{"fault":"ServerFault"}""")
    })
    server.start()
    try {
      val tokens = new QboTokenSource {
        def accessToken: String = "fresh-token"
        def refresh(): String = "fresh-token"
      }
      val api = new QboHttpApi(
        s"http://127.0.0.1:${server.getAddress.getPort}", "r123", tokens)
      val e = intercept[RuntimeException] {
        QboSource.fetchAll(api, "Bill", Schemas.bill, spark)
      }
      assert(e.getMessage.contains("HTTP 500"), e.getMessage)
    } finally server.stop(0)
  }
}
