package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions

/** Semantic deduplication (the SemDedup recipe): cluster the embedding
  * space with a small k-means codebook, pick one representative per
  * cluster (the member nearest its centroid), and drop every other
  * member whose cosine to the representative exceeds a threshold —
  * near-duplicate MEANING, not near-duplicate text.
  *
  * Scale design: the pair space is members × representatives — O(n),
  * not O(n²) — because each member is compared only to its OWN
  * cluster's single representative. The codebook and the
  * representative-vector table are both ≤ numCentroids rows
  * (constant-size broadcast builds, the audited q36 class); the corpus
  * side shuffles once, on cluster id. Reuses [[Ivf]]'s integer-exact
  * deterministic k-means so a SQL oracle reproduces cluster membership
  * bit-for-bit.
  */
object SemDedup {

  /** Per-vector verdicts: (vec_id, cid, is_rep, cos, dropped) where
    * `cos` is the member↔representative cosine on the ORIGINAL float
    * vectors (double-cast; rep vs itself evaluates through the same
    * expression in both engines) and `dropped` flags non-representative
    * members with cos ≥ tau. */
  def verdicts(embeddings: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, iterations: Int, tau: Double): DataFrame = {
    val cents = Ivf.centroids(embeddings, idCol, vecCol,
      numCentroids, iterations)
    val vectors = Ivf.quantized(embeddings, idCol, vecCol)
    // id-only argmin: the rep election needs (cid, d2) only — the
    // 64-element vector must not ride the exchange (Ivf.assignIds)
    val assigned = Ivf.assignIds(vectors, cents)
      .select(col("vec_id"), col("cid"), col("d2"))

    val wRep = Window.partitionBy(col("cid"))
      .orderBy(col("d2").asc, col("vec_id").asc)
    val marked = assigned
      .withColumn("rn", row_number().over(wRep))
    val reps = marked.filter(col("rn") === 1)
      .select(col("cid"), col("vec_id").as("rep_id"))

    val base = Similarity.withNorm(embeddings, idCol, vecCol)
    val m = base.select(col(idCol).as("m_id"), col(vecCol).as("m_vec"),
      col("nrm").as("m_nrm"))
    val r = base.select(col(idCol).as("r_id"), col(vecCol).as("r_vec"),
      col("nrm").as("r_nrm"))

    // representative vectors: ≤ numCentroids rows (reps is the build
    // side of the id-join against the corpus), then a constant-size
    // broadcast keyed on cluster id — the corpus side never shuffles
    // for it; its one exchange is the id-keyed join to its own vector.
    val repVecs = broadcast(reps).join(r, col("rep_id") === col("r_id"))
      .select(col("cid"), col("rep_id"), col("r_vec"), col("r_nrm"))

    marked.select(col("vec_id"), col("cid"))
      .join(m, col("vec_id") === col("m_id"))
      .join(broadcast(repVecs), "cid")
      .withColumn("cos",
        VectorFunctions.dot(col("m_vec"), col("r_vec")) /
          (col("m_nrm") * col("r_nrm")))
      .select(col("vec_id"), col("cid"),
        (col("vec_id") === col("rep_id")).as("is_rep"),
        col("cos"),
        (col("vec_id") =!= col("rep_id") && col("cos") >= tau)
          .as("dropped"))
  }
}
