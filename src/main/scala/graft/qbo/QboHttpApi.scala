package graft.qbo

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Access-token supply for the live client — the engine-side face of
  * the reference's OAuth2 refresh flow (SURVEY §2.1 S1 keeps the token
  * dance out of engine scope; this trait is where it plugs in).
  * `refresh()` is called on a 401 and must return a usable token.
  */
trait QboTokenSource {
  def accessToken: String
  def refresh(): String
}

/** Live HTTP binding of [[QboApi]]: POSTs the entity query to
  * `/v3/company/{realm}/query` with Bearer auth, retrying ONCE through
  * `tokens.refresh()` on 401 — the reference's request shape
  * (`qb_bills.py:40-44`: base URL + realm + query param, Authorization
  * header) re-expressed over the JDK HttpClient, no extra deps.
  *
  * The page text returns as-is; structuring stays in
  * [[QboSource.entityFrame]] (distributed, declared-schema) — the
  * client is deliberately a thin transport so the DSv2 source and the
  * [[QboSource.fetchAll]] loop drive it identically to the fixture
  * backends.
  */
final class QboHttpApi(baseUrl: String, realm: String,
    tokens: QboTokenSource) extends QboApi {

  private val client = HttpClient.newHttpClient()

  override def queryPage(entity: String, startPosition: Int): String = {
    val q = s"SELECT * FROM $entity STARTPOSITION $startPosition " +
      s"MAXRESULTS ${QboSource.PageSize}"
    def send(token: String): HttpResponse[String] = {
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"$baseUrl/v3/company/$realm/query"))
        .header("Authorization", s"Bearer $token")
        .header("Content-Type", "application/text")
        .header("Accept", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(q))
        .build()
      client.send(req, HttpResponse.BodyHandlers.ofString())
    }
    var resp = send(tokens.accessToken)
    if (resp.statusCode() == 401) resp = send(tokens.refresh())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"QBO query failed: HTTP ${resp.statusCode()} ${resp.body()}")
    resp.body()
  }
}
