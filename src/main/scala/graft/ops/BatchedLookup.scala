package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S2: batched point-lookup — the engine counterpart of the reference's
  * 50-id episode batching (`spotify_eps.py:115-118`: chunk the URI list,
  * one `/v1/episodes?ids=a,b,c` call per chunk, parse each response).
  *
  * Spark-native shape: chunking happens INSIDE `mapPartitions`, so each
  * executor amortizes one lookup call per `batchSize` keys with zero
  * driver round-trips — the reference's driver-side for-loop becomes a
  * distributed operator. The lookup function is pluggable (an HTTP
  * client in production, a deterministic fixture in tests/oracles) and
  * must be serializable; per-call setup can be amortized further by
  * closing over a lazily-initialized client.
  *
  * At 100 TB scale the id side is repartitioned so call concurrency =
  * partitions, and a rate-limited service is protected by sizing
  * `ids.repartition(n)` rather than a driver semaphore.
  */
object BatchedLookup {

  /** Chunk the key column into `batchSize` groups per partition and call
    * `lookup` once per chunk. Returns one payload row per call — feed
    * into the payload parsers (e.g. EpisodeOps.parsePayloads). */
  def fetchPayloads(ids: DataFrame, idCol: String, batchSize: Int,
      lookup: Seq[String] => String): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("string")).as[String]
      .mapPartitions(_.grouped(batchSize).map(chunk => lookup(chunk.toSeq)))
      .toDF("payload")
  }

  /** Deterministic stand-in for the episode service: answers a batch of
    * ids with a `/v1/episodes`-shaped envelope whose fields are pure
    * functions of the id — lets the batched path run under the oracle
    * gate with no network. */
  def fixtureEpisodeService(ids: Seq[String]): String =
    ids.map(id =>
      s"""{"id":"$id","name":"ep-$id","duration_ms":${id.toLong % 100000L}}""")
      .mkString("""{"episodes":[""", ",", "]}")
}
