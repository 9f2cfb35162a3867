package graft.ops

import graft.sources.{HttpFetch, HttpStatusException, OAuthClientCredentials}

/** Online lookup closures for [[BatchedLookup.fetchPayloads]] — the
  * production counterpart of `fixtureEpisodeService`.
  */
object HttpLookup {

  /** Batched episode fetch against a `/v1/episodes`-shaped endpoint
    * (`spotify_eps.py:51-64`): GET `{endpoint}?ids=a,b,c&market={m}`
    * with a bearer token from the client-credentials flow
    * (`spotify_eps.py:18-32`).
    *
    * The returned closure is what ships to executors; `creds` is a
    * small serializable config and the token is exchanged LAZILY, once
    * per executor JVM — not per batch (the reference likewise fetches
    * one token per task run), and never via the driver. Non-2xx on
    * either round-trip throws → task failure → Spark task retry, the
    * reference's raise_for_status seam.
    */
  def episodeService(endpoint: String, market: String,
      creds: OAuthClientCredentials): Seq[String] => String =
    (ids: Seq[String]) => {
      val url = endpoint + "?ids=" +
        java.net.URLEncoder.encode(ids.mkString(","), "UTF-8") +
        "&market=" + java.net.URLEncoder.encode(market, "UTF-8")
      try HttpFetch.get(url, tokenHeader(creds))
      catch {
        // the cached token can outlive its TTL on a long job — a 401
        // with a stale cache would otherwise fail EVERY task retry
        // identically until the job aborts. Evict, re-exchange once,
        // and retry the call; a second 401 is a genuine auth failure
        // and propagates (task failure → task retry, as for any 4xx).
        case HttpStatusException(401, _) =>
          tokens.remove(creds)
          HttpFetch.get(url, tokenHeader(creds))
      }
    }

  // per-executor-JVM token cache: the closure above references this
  // object statically (objects aren't serialized with the lambda), so
  // every task on an executor shares one exchanged token per creds —
  // a local `lazy val` would deserialize fresh per task and re-exchange
  private val tokens =
    new java.util.concurrent.ConcurrentHashMap[
      OAuthClientCredentials, Map[String, String]]()
  private def tokenHeader(creds: OAuthClientCredentials): Map[String, String] =
    tokens.computeIfAbsent(creds, c => c.bearerHeader())
}
