package graft.qbo

import java.net.InetSocketAddress
import java.net.URLDecoder

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.queries.QboPipelines

/** Live-API contract tests for the Reports family (S5-S7 transport) and
  * the OAuth2 refresh-token exchange (S1): an in-process HTTP server
  * (loopback only) speaking the QBO request shapes — GET
  * `/reports/<Name>` with `start_date`/`end_date` (+ ByVendor's
  * `start_position`/`max_results`/`columns`), and the
  * `grant_type=refresh_token` POST with Basic auth and token rotation —
  * driven end-to-end through [[QboHttpApi]] / [[QboOAuth2TokenSource]]
  * → [[Reports.Fetch]] → the same parse layer the fixture-backed
  * CORRECTNESS queries exercise.
  */
class QboReportsContractSpec extends SparkSpec {

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def freshTokens = new QboTokenSource {
    def accessToken: String = "fresh-token"
    def refresh(): String = "fresh-token"
  }

  private def withServer(register: HttpServer => Unit)(body: HttpServer => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    register(server)
    server.start()
    try body(server) finally server.stop(0)
  }

  test("P&L month loop over live HTTP matches the fixture pipeline (S5)") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    withServer { server =>
      server.createContext("/v3/company/r123/reports/ProfitAndLoss",
        (ex: HttpExchange) => {
          assert(ex.getRequestMethod == "GET")
          assert(ex.getRequestHeaders.getFirst("Authorization") == "Bearer fresh-token")
          val p = params(ex)
          seen.synchronized { seen += (p("start_date") -> p("end_date")) }
          val month = p("start_date").substring(0, 7)
          val report = Fixtures.pnlReports.toMap.apply(month)
          respond(ex, 200, report)
        })
    } { server =>
      val api = new QboHttpApi(
        s"http://127.0.0.1:${server.getAddress.getPort}", "r123", freshTokens)
      val pairs = Reports.Fetch.profitAndLoss(api,
        java.time.YearMonth.of(2024, 1), java.time.YearMonth.of(2024, 2))
      // month windows exactly as the reference builds them (incl. the
      // leap-year February end date relativedelta(day=31) produces)
      assert(seen.toSeq == Seq(
        "2024-01-01" -> "2024-01-31", "2024-02-01" -> "2024-02-29"))
      val live = Reports.ProfitAndLoss.warehouse(Reports.ProfitAndLoss.stage(
        Reports.ProfitAndLoss.flatten(spark, pairs).toDF()))
        .collect().map(_.toSeq).toSet
      val fixture = QboPipelines.pnlWarehouse(spark).collect().map(_.toSeq).toSet
      assert(live == fixture)
      assert(live.nonEmpty)
    }
  }

  test("TransactionList single tabular fetch over live HTTP (S6)") {
    withServer { server =>
      server.createContext("/v3/company/r123/reports/TransactionList",
        (ex: HttpExchange) => {
          val p = params(ex)
          assert(p("start_date") == "2022-01-01" && p("end_date") == "2024-03-31")
          respond(ex, 200, Fixtures.transactionListReport)
        })
    } { server =>
      val api = new QboHttpApi(
        s"http://127.0.0.1:${server.getAddress.getPort}", "r123", freshTokens)
      val json = Reports.Fetch.transactionList(api, "2022-01-01", "2024-03-31")
      val live = Reports.TransactionList.warehouse(
        Reports.TransactionList.parse(spark, json))
        .collect().map(_.toSeq).toSet
      val fixture = QboPipelines.transactionListWarehouse(spark)
        .collect().map(_.toSeq).toSet
      assert(live == fixture)
      assert(live.nonEmpty)
    }
  }

  test("ByVendor paginates on hasMore with server-side column " +
    "projection (S7)") {
    // page 1 = the fixture report + hasMore:true; page 2 = one more
    // vendor, no hasMore → loop must stop after exactly two requests
    val page1 = Fixtures.byVendorReport.replaceFirst(
      "\\{", "{\"hasMore\": true, ")
    val page2 =
      """{"Header": {"Time": "2024-04-01", "StartPeriod": "2015-01-01",
          "EndPeriod": "2024-03-31"},
        "Rows": {"Row": [
          {"Header": {"ColData": [{"value": "Gamma Co", "id": "99"}]},
           "Rows": {"Row": [
             {"ColData": [{"value": "2024-02-02"}, {"value": "Bill"},
               {"value": "B-2"}, {"value": "Yes"}, {"value": "memo"},
               {"value": "Accounts Payable"}, {"value": "10.00"}]}]}}]}}"""
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    withServer { server =>
      server.createContext("/v3/company/r123/reports/TransactionListByVendor",
        (ex: HttpExchange) => {
          val p = params(ex)
          // the only pushdown the reference performs: server-side
          // column projection + pagination params
          assert(p("columns") == "Vendor ID, Vendor Name", p)
          assert(p("max_results") == "100", p)
          val sp = p("start_position").toInt
          starts.synchronized { starts += sp }
          respond(ex, 200, if (sp == 1) page1 else page2)
        })
    } { server =>
      val api = new QboHttpApi(
        s"http://127.0.0.1:${server.getAddress.getPort}", "r123", freshTokens)
      val pages = Reports.Fetch.transactionListByVendor(api,
        "2015-01-01", "2024-03-31",
        columns = Some("Vendor ID, Vendor Name"))
      assert(starts.toSeq == Seq(1, 101))
      assert(pages.size == 2)
      val df = Reports.TransactionListByVendor.warehouse(
        Reports.TransactionListByVendor.parsePages(spark, pages))
      // page1: 2 Acme txns + 1 empty-vendor row (Beta); page2: 1 Gamma txn
      assert(df.count() == 4)
      val vendors = df.select("vendor_id").collect().map(_.getInt(0)).toSet
      assert(vendors == Set(56, 57, 99))
    }
  }

  test("OAuth2 refresh-token exchange: Basic auth, form body, rotation " +
    "riding through the 401-retry path (S1)") {
    val expectBasic = "Basic " + java.util.Base64.getEncoder.encodeToString(
      "cid-1:secret-9".getBytes("UTF-8"))
    val refreshTokensSeen = scala.collection.mutable.ArrayBuffer.empty[String]
    @volatile var issued = 0
    @volatile var expiredFresh1 = false
    def billRows(ids: Range): String =
      ids.map(i => s"""{"Id":"$i","TxnDate":"2024-01-02","Balance":$i}""")
        .mkString("[", ",", "]")
    def page(ids: Range): String =
      s"""{"QueryResponse":{"Bill":${billRows(ids)},"maxResults":${ids.size}}}"""
    withServer { server =>
      server.createContext("/oauth2/v1/tokens/bearer", (ex: HttpExchange) => {
        assert(ex.getRequestMethod == "POST")
        assert(ex.getRequestHeaders.getFirst("Authorization") == expectBasic)
        assert(ex.getRequestHeaders.getFirst("Content-Type")
          .startsWith("application/x-www-form-urlencoded"))
        val form = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          .split("&").map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> URLDecoder.decode(v, "UTF-8")
          }.toMap
        assert(form("grant_type") == "refresh_token", form)
        refreshTokensSeen.synchronized { refreshTokensSeen += form("refresh_token") }
        issued += 1
        // QBO rotates the refresh token on every exchange
        respond(ex, 200,
          s"""{"access_token": "fresh-$issued", "refresh_token": "rt-${issued + 1}",
              "token_type": "bearer", "expires_in": 3600}""")
      })
      server.createContext("/v3/company/r123/query", (ex: HttpExchange) => {
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val sp = "STARTPOSITION (\\d+)".r.findFirstMatchIn(body).get.group(1).toInt
        auth match {
          case "Bearer fresh-1" if !expiredFresh1 =>
            if (sp == 1) { expiredFresh1 = true; respond(ex, 200, page(1 to 100)) }
            else respond(ex, 401, """{"fault":"AuthenticationFault"}""")
          case "Bearer fresh-2" if expiredFresh1 =>
            respond(ex, 200, page(101 to 137))
          case _ => respond(ex, 401, """{"fault":"AuthenticationFault"}""")
        }
      })
    } { server =>
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val tokens = new QboOAuth2TokenSource(
        s"$base/oauth2/v1/tokens/bearer", "cid-1", "secret-9", "rt-1")
      val api = new QboHttpApi(base, "r123", tokens)
      val df = QboSource.fetchAll(api, "Bill", Schemas.bill, spark)
      assert(df.count() == 137)
      // exchange #1 bootstrapped with the initial refresh token; the
      // mid-run 401 forced exchange #2, which MUST use the rotated one
      assert(refreshTokensSeen.toSeq == Seq("rt-1", "rt-2"))
    }
  }
}
