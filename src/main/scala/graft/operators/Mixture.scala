package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture accounting for training-data assembly: given the
  * corpus's actual per-source composition, compute the sampling weight
  * each source needs to hit a target mixture (uniform by default) —
  * weight > 1 means upsample, < 1 downsample.
  *
  * The heavy side is one hash aggregation over the corpus (source →
  * count); the mixture arithmetic runs on the handful of grouped rows,
  * so the windows over the unpartitioned group frame are a few dozen
  * rows on one reducer — deliberate and scale-safe (the GROUPS are
  * small even when the corpus is 100 TB).
  */
object Mixture {

  /** Per-source mixture row: (source, n_docs, actual_frac, weight) with
    * weight = target_frac / actual_frac for a UNIFORM target across the
    * sources present. Double division over exact integer counts — the
    * same expression tree an oracle computes, bit-identical. */
  def uniformMixtureWeights(docs: DataFrame, sourceCol: String): DataFrame = {
    val w = Window.partitionBy()
    docs
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(
        col("source"), col("n_docs"),
        (col("n_docs").cast("double") /
          sum(col("n_docs")).over(w).cast("double")).as("actual_frac"),
        ((lit(1.0) / count(lit(1)).over(w).cast("double")) /
          (col("n_docs").cast("double") /
            sum(col("n_docs")).over(w).cast("double"))).as("weight"))
  }
}
