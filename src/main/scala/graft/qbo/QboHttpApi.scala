package graft.qbo

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Access-token supply for the live client — the engine-side face of
  * the reference's OAuth2 refresh flow (SURVEY §2.1 S1).
  * `refresh()` is called on a 401 and must return a usable token.
  * [[QboOAuth2TokenSource]] is the live implementation; tests plug in
  * fakes.
  */
trait QboTokenSource {
  def accessToken: String
  def refresh(): String
}

/** Live OAuth2 refresh-token exchange (Quickbooks_API.py:14-36): POST
  * `grant_type=refresh_token` form-encoded with HTTP Basic
  * `clientId:clientSecret`, parse `access_token` from the JSON reply.
  * QBO rotates refresh tokens — when the reply carries a new
  * `refresh_token` it replaces the stored one, so the NEXT exchange
  * uses the rotated credential (the reference prints the response and
  * drops the rotation on the floor; a long-running engine cannot).
  *
  * Thread-safety: `refresh()` is synchronized — concurrent 401s from
  * parallel page fetches collapse into one exchange at a time rather
  * than racing the rotation.
  */
final class QboOAuth2TokenSource(tokenUrl: String, clientId: String,
    clientSecret: String, initialRefreshToken: String) extends QboTokenSource {

  private val client = HttpClient.newHttpClient()
  private var refreshToken = initialRefreshToken
  private var token: String = ""

  override def accessToken: String =
    synchronized { if (token.isEmpty) refresh() else token }

  override def refresh(): String = synchronized {
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes("UTF-8"))
    val form = "grant_type=refresh_token&refresh_token=" +
      URLEncoder.encode(refreshToken, "UTF-8")
    val req = HttpRequest.newBuilder()
      .uri(URI.create(tokenUrl))
      .header("Authorization", s"Basic $basic")
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Accept", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(form))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"OAuth2 refresh failed: HTTP ${resp.statusCode()} ${resp.body()}")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(resp.body())
    val access = node.path("access_token").asText("")
    if (access.isEmpty)
      throw new RuntimeException(
        "OAuth2 refresh response carried no access_token: " + resp.body())
    val rotated = node.path("refresh_token").asText("")
    if (rotated.nonEmpty) refreshToken = rotated
    token = access
    access
  }
}

/** Live HTTP binding of [[QboApi]] + [[QboReportsApi]]: the entity
  * query POSTs to `/v3/company/{realm}/query` (`qb_bills.py:40-44`),
  * reports GET `/v3/company/{realm}/reports/<Name>` with query-string
  * params (`qb_profit&loss.py:42-67`, `qb_transactionlist.py:46-60`,
  * `qb_transactionlistbyvendordetail.py:42-70`) — both with Bearer
  * auth, retrying ONCE through `tokens.refresh()` on 401. JDK
  * HttpClient, no extra deps.
  *
  * The page/report text returns as-is; structuring stays in
  * [[QboSource.entityFrame]] / [[Reports]] (distributed,
  * declared-schema) — the client is deliberately a thin transport so
  * the DSv2 source, the [[QboSource.fetchAll]] loop and the
  * [[Reports.Fetch]] loops drive it identically to the fixture
  * backends.
  */
final class QboHttpApi(baseUrl: String, realm: String,
    tokens: QboTokenSource) extends QboApi with QboReportsApi {

  private val client = HttpClient.newHttpClient()

  /** Shared auth/retry shell: send with the current token, retry once
    * through `refresh()` on 401, loud error on anything else non-200.
    */
  private def sendAuthed(build: String => HttpRequest): String = {
    def send(token: String): HttpResponse[String] =
      client.send(build(token), HttpResponse.BodyHandlers.ofString())
    var resp = send(tokens.accessToken)
    if (resp.statusCode() == 401) resp = send(tokens.refresh())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"QBO request failed: HTTP ${resp.statusCode()} ${resp.body()}")
    resp.body()
  }

  override def queryPage(entity: String, startPosition: Int): String = {
    val q = s"SELECT * FROM $entity STARTPOSITION $startPosition " +
      s"MAXRESULTS ${QboSource.PageSize}"
    sendAuthed { token =>
      HttpRequest.newBuilder()
        .uri(URI.create(s"$baseUrl/v3/company/$realm/query"))
        .header("Authorization", s"Bearer $token")
        .header("Content-Type", "application/text")
        .header("Accept", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(q))
        .build()
    }
  }

  override def report(name: String, params: Seq[(String, String)]): String = {
    val qs = params.map { case (k, v) =>
      URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val suffix = if (qs.isEmpty) "" else s"?$qs"
    sendAuthed { token =>
      HttpRequest.newBuilder()
        .uri(URI.create(s"$baseUrl/v3/company/$realm/reports/$name$suffix"))
        .header("Authorization", s"Bearer $token")
        .header("Content-Type", "application/json")
        .header("Accept", "application/json")
        .GET()
        .build()
    }
  }
}
