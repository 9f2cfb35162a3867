package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Drives the ONLINE ingest seams against an in-JVM stub HTTP server —
  * the closest an egress-free sandbox gets to
  * `spotify_eps.py:18-32,37-49,51-64`. Asserts the request shape the
  * reference emits (path, region param, Referer, Basic-auth token
  * exchange, ids/market batching) and the failure semantics
  * (non-2xx → thrown → task failure), not just the happy payload.
  */
class PodchartHttpSpec extends SparkSpec {

  private def withServer(test: (String, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new ConcurrentLinkedQueue[String]()
    def reply(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      x.sendResponseHeaders(code, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    }
    server.createContext("/api/charts/top_episodes", (x: HttpExchange) => {
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      val referer = Option(x.getRequestHeaders.getFirst("Referer")).getOrElse("")
      seen.add(s"chart ${x.getRequestURI.getPath}?$q referer=$referer")
      val region = q.stripPrefix("region=")
      if (region == "boom") reply(x, 503, "upstream sad")
      else reply(x, 200,
        s"""[{"showName":"show-$region","episodeName":"ep1",""" +
          s""""episodeUri":"spotify:episode:$region-1","rank":1}]""")
    })
    server.createContext("/token", (x: HttpExchange) => {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      seen.add(s"token auth=$auth body=$body")
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("cid:sekrit".getBytes(UTF_8))
      if (auth != expected || body != "grant_type=client_credentials")
        reply(x, 401, """{"error":"invalid_client"}""")
      else reply(x, 200, """{"access_token":"tok-123","token_type":"Bearer"}""")
    })
    server.createContext("/v1/episodes", (x: HttpExchange) => {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      seen.add(s"episodes ${x.getRequestURI.getQuery} auth=$auth")
      if (auth != "Bearer tok-123") reply(x, 401, """{"error":"no token"}""")
      else reply(x, 200, """{"episodes":[]}""")
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", seen)
    finally server.stop(0)
  }

  test("http mode fetches one payload row per region with the reference's request shape") {
    withServer { (base, seen) =>
      val df = spark.read.format("podchart")
        .option("http.url", s"$base/api/charts")
        .option("http.regions", "us,gb,us") // dup collapses: one fetch per region
        .option("http.date", "2026-08-13")
        .option("http.referer", "https://charts.example/")
        .load()
      assert(df.rdd.getNumPartitions == 2, "one partition per distinct region")
      // collect + sort locally: an orderBy directly on the source would
      // range-sample it first = a SECOND fetch per region (which is why
      // production pipelines land raw payloads in bronze before sorting)
      val rows = df.collect().sortBy(_.getString(1))
      assert(rows.map(_.getString(1)).toSeq == Seq("gb", "us"))
      assert(rows.forall(_.getString(0) == "2026-08-13"))
      assert(rows.forall(r => r.getString(2).contains(
        s"""show-${r.getString(1)}""")))
      import scala.jdk.CollectionConverters._
      val chartReqs = seen.asScala.filter(_.startsWith("chart")).toSeq
      assert(chartReqs.size == 2, s"exactly one fetch per region: $chartReqs")
      assert(chartReqs.forall(_.contains("/api/charts/top_episodes?region=")))
      assert(chartReqs.forall(_.endsWith("referer=https://charts.example/")))
    }
  }

  test("http payloads flow into the engine-side chart parser unchanged") {
    withServer { (base, _) =>
      val raw = spark.read.format("podchart")
        .option("http.url", s"$base/api/charts")
        .option("http.regions", "us")
        .option("http.date", "2026-08-13")
        .load()
      val parsed = graft.ops.ChartOps.parsePayloads(raw)
      val r = parsed.collect()
      assert(r.length == 1)
      assert(parsed.columns.contains("rank"))
    }
  }

  test("non-2xx fails the fetch task (raise_for_status semantics)") {
    withServer { (base, _) =>
      val df = spark.read.format("podchart")
        .option("http.url", s"$base/api/charts")
        .option("http.regions", "boom")
        .option("http.date", "2026-08-13")
        .load()
      val e = intercept[org.apache.spark.SparkException] { df.collect() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(_.getMessage != null)
        && chain(e).exists(c => c.getMessage.contains("HTTP 503")),
        s"expected HTTP 503 in the failure chain, got: $e")
    }
  }

  test("missing http.regions fails fast at planning, not with an empty frame") {
    val e = intercept[Exception] {
      spark.read.format("podchart")
        .option("http.url", "http://127.0.0.1:1/api/charts")
        .load().collect()
    }
    assert(e.getMessage.contains("http.regions"))
  }

  test("client-credentials flow exchanges Basic auth for the bearer token") {
    withServer { (base, seen) =>
      val creds = OAuthClientCredentials(s"$base/token", "cid", "sekrit")
      assert(creds.fetchToken() == "tok-123")
      val bad = OAuthClientCredentials(s"$base/token", "cid", "wrong")
      intercept[java.io.IOException] { bad.fetchToken() }
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.count(_.startsWith("token")) == 2)
    }
  }

  test("a 401 mid-job evicts the cached token, re-exchanges, and retries once") {
    // stateful stub: every token exchange mints tok-N; the episodes
    // endpoint only honors the LATEST minted token — so a consumer
    // holding a cached earlier token gets 401 exactly like an expired
    // bearer, and must refresh to proceed
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val minted = new java.util.concurrent.atomic.AtomicInteger(0)
    val calls = new ConcurrentLinkedQueue[String]()
    def reply(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      x.sendResponseHeaders(code, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    }
    server.createContext("/token", (x: HttpExchange) => {
      x.getRequestBody.readAllBytes()
      reply(x, 200, s"""{"access_token":"tok-${minted.incrementAndGet()}"}""")
    })
    server.createContext("/v1/episodes", (x: HttpExchange) => {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      calls.add(auth)
      if (auth == s"Bearer tok-${minted.get()}") reply(x, 200, """{"episodes":[]}""")
      else reply(x, 401, """{"error":"expired"}""")
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val creds = OAuthClientCredentials(s"$base/token", "cid", "sekrit")
      val lookup = graft.ops.HttpLookup.episodeService(
        s"$base/v1/episodes", "us", creds)
      assert(lookup(Seq("1")) == """{"episodes":[]}""") // caches tok-N
      creds.fetchToken() // out-of-band exchange mints a newer token →
      // the server now only honors it, "expiring" the cached one
      // cached token is now stale → 401 → evict → re-exchange → succeed
      assert(lookup(Seq("2")) == """{"episodes":[]}""")
      import scala.jdk.CollectionConverters._
      val seq = calls.asScala.toSeq
      assert(seq.length == 3, s"expected ok, 401, refreshed-ok: $seq")
      assert(seq(0) == seq(1), "retry must have been triggered by the stale token")
      assert(seq(2) != seq(1), "the retried call must carry a fresh token")
    } finally server.stop(0)
  }

  test("missing http.date fails fast at planning — no wall-clock default") {
    // defaulting to now() would stamp a different date on a replan
    // across UTC midnight: the logical date is the orchestrator's input
    val e = intercept[Exception] {
      spark.read.format("podchart")
        .option("http.url", "http://127.0.0.1:1/api/charts")
        .option("http.regions", "us")
        .load().collect()
    }
    assert(e.getMessage.contains("http.date"), e.getMessage)
  }

  test("impossible http.date fails fast at planning, not server-side") {
    // shape-valid but non-calendar: would otherwise land in every fetch
    // URL and fail only when the server rejects it
    val e = intercept[Exception] {
      spark.read.format("podchart")
        .option("http.url", "http://127.0.0.1:1/api/charts")
        .option("http.regions", "us")
        .option("http.date", "2026-99-99")
        .load().collect()
    }
    assert(e.getMessage.contains("http.date"), e.getMessage)
  }

  test("non-2xx surfaces as a TYPED status, not a message format") {
    withServer { (base, _) =>
      val e = intercept[HttpStatusException] {
        HttpFetch.get(s"$base/api/charts/top_episodes?region=boom")
      }
      assert(e.status == 503)
      assert(e.url.contains("region=boom"))
    }
  }

  test("token parse survives escaped quotes in preceding JSON fields") {
    // a regex scraper would mis-anchor on the escaped quote; the Jackson
    // parse must not
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def reply(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      x.sendResponseHeaders(code, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    }
    server.createContext("/token", (x: HttpExchange) => {
      x.getRequestBody.readAllBytes()
      reply(x, 200,
        """{"note":"say \"hi\" \\","access_token":"tok-esc","scope":""}""")
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      assert(OAuthClientCredentials(s"$base/token", "c", "s")
        .fetchToken() == "tok-esc")
    } finally server.stop(0)
  }

  test("http.chart slug is validated at planning time") {
    val e = intercept[Exception] {
      spark.read.format("podchart")
        .option("http.url", "http://127.0.0.1:1/api/charts")
        .option("http.regions", "us")
        .option("http.chart", "top episodes")
        .load().collect()
    }
    assert(e.getMessage.contains("http.chart"), e.getMessage)
  }

  test("batched episode lookup sends ids+market with the exchanged bearer token") {
    withServer { (base, seen) =>
      val s = spark
      import s.implicits._
      val ids = Seq("11", "22", "33", "44", "55").toDF("episode_id")
        .repartition(1) // one deterministic chunking for the assertion
      val lookup = graft.ops.HttpLookup.episodeService(
        s"$base/v1/episodes", "us",
        OAuthClientCredentials(s"$base/token", "cid", "sekrit"))
      val payloads = graft.ops.BatchedLookup
        .fetchPayloads(ids, "episode_id", batchSize = 2, lookup)
        .collect()
      assert(payloads.length == 3) // ceil(5/2) calls, 50-id discipline at 2
      import scala.jdk.CollectionConverters._
      val eps = seen.asScala.filter(_.startsWith("episodes")).toSeq
      assert(eps.size == 3)
      assert(eps.forall(_.contains("market=us")))
      assert(eps.forall(_.endsWith("auth=Bearer tok-123")))
      // getQuery decodes %2C back to ',' — assert the decoded batch
      assert(eps.exists(_.contains("ids=11,22")), s"batching shape: $eps")
    }
  }
}
