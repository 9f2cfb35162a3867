package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** Minimal HTTP boundary for the online ingest variants — JDK
  * `java.net.http` only, no new dependencies. Non-2xx responses THROW
  * (the reference's `response.raise_for_status()`,
  * `spotify_eps.py:44-46,60-62`): inside a DSv2 reader or a
  * mapPartitions lookup that failure fails the Spark TASK, and the
  * scheduler's task retry (`spark.task.maxFailures`) plays the role of
  * the Airflow task retry the reference relies on.
  */
/** Non-2xx response, carried as a TYPED status so callers branch on
  * `status` (e.g. [[graft.ops.HttpLookup]]'s 401 token refresh) instead
  * of string-matching the message — a message-format change must not be
  * able to silently disable auth-retry logic. Still an IOException, so
  * generic task-failure handling is unchanged.
  */
case class HttpStatusException(status: Int, url: String)
  extends java.io.IOException(s"HTTP $status for $url")

object HttpFetch {

  // one client per JVM (executor): connection pooling across partitions
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def send(req: HttpRequest, url: String): String = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    if (resp.statusCode() / 100 != 2)
      throw HttpStatusException(resp.statusCode(), url) // raise_for_status
    resp.body()
  }

  /** GET `url`; returns the UTF-8 body on 2xx, throws otherwise. */
  def get(url: String, headers: Map[String, String] = Map.empty,
      timeoutMs: Int = 30000): String = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs.toLong)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    send(b.build(), url)
  }

  /** POST an application/x-www-form-urlencoded body; 2xx body or throw. */
  def postForm(url: String, headers: Map[String, String],
      form: Map[String, String], timeoutMs: Int = 30000): String = {
    val body = form
      .map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }
      .mkString("&")
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs.toLong))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
    headers.foreach { case (k, v) => b.header(k, v) }
    send(b.build(), url)
  }
}

/** OAuth2 client-credentials config — the connector surface the
  * reference keeps in Airflow Variables (`spotify_eps.py:11-13`) and
  * exchanges for a bearer token at `spotify_eps.py:18-32`: Basic
  * base64(id:secret) + `grant_type=client_credentials` form POST,
  * `access_token` out of the JSON response.
  *
  * Serializable on purpose: closures built from it (e.g.
  * [[graft.ops.HttpLookup.episodeService]]) ship to executors, and each
  * executor fetches its own token lazily — tokens never transit the
  * driver→executor boundary in plan literals.
  */
case class OAuthClientCredentials(
    tokenUrl: String, clientId: String, clientSecret: String)
  extends Serializable {

  /** Exchange client credentials for a bearer token (one round-trip). */
  def fetchToken(): String = {
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(UTF_8))
    val body = HttpFetch.postForm(tokenUrl,
      Map("Authorization" -> s"Basic $basic"),
      Map("grant_type" -> "client_credentials"))
    // parse with Jackson (already on Spark's classpath — no new
    // dependency): a regex over the raw body would mis-read legal
    // responses with escaped quotes/backslashes in preceding fields
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body).get("access_token")
    if (node == null || !node.isTextual || node.asText().isEmpty)
      throw new java.io.IOException(
        s"no access_token in token response from $tokenUrl")
    node.asText()
  }

  def bearerHeader(): Map[String, String] =
    Map("Authorization" -> s"Bearer ${fetchToken()}")
}
