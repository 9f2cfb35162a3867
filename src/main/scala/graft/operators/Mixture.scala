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

  private val Mod60 = 1152921504606846976L // 2^60

  /** Deterministic downsample toward the uniform mixture: each doc is
    * kept iff its md5-derived uniform draw falls under the source's
    * keep fraction min(1, weight) — upsampling (weight > 1) is a
    * repetition decision left to the training loader; here it clamps
    * to keep-all. Membership is a pure function of the id (same
    * contract as the train/val/test split): partition-layout-invariant,
    * append-stable, reproducible in any engine. The per-source fraction
    * frame is tiny and broadcasts. */
  def downsampleToMixture(docs: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    val fracs = uniformMixtureWeights(docs, sourceCol)
      .select(col("source").as("__src"),
        least(lit(1.0), col("weight")).as("__frac"))
    val draw = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double")
    docs
      .join(broadcast(fracs), col(sourceCol) === col("__src"))
      .filter(draw < col("__frac") * lit(Mod60.toDouble))
      .select(col(idCol), col(sourceCol))
  }

  /** Per-document EPOCH materialization toward the uniform mixture —
    * the upsampling half [[downsampleToMixture]] leaves "to the
    * training loader", answered engine-side: a doc from a source with
    * weight w repeats floor(w) times, plus one more iff its
    * md5-uniform draw falls under frac(w) — so each source's expected
    * repetition is exactly w and the assembled set hits the target
    * mixture in expectation, deterministically (pure function of the
    * id, the split/downsample contract). Output: (idCol, sourceCol,
    * n_epochs) with n_epochs ≥ 0 (a heavily-overrepresented source
    * downsamples via epoch 0 exactly like [[downsampleToMixture]]'s
    * drop).
    *
    * Scale shape: one hash aggregation for the weights (bounded,
    * broadcasts back), one corpus scan, zero windows over the corpus.
    * [[materializeEpochs]] turns the assignment into the physical
    * repeated training set via an in-row sequence explode — output
    * size Σ n_epochs, each copy tagged with its epoch index so shard
    * assignment can spread repeats. */
  def epochsToMixture(docs: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    val w = uniformMixtureWeights(docs, sourceCol)
      .select(col("source").as("__src"), col("weight"))
    val draw = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double")
    docs
      .join(broadcast(w), col(sourceCol) === col("__src"))
      .select(col(idCol), col(sourceCol),
        (floor(col("weight")).cast("long") +
          when(draw < (col("weight") - floor(col("weight"))) *
            lit(Mod60.toDouble), 1L).otherwise(0L)).as("n_epochs"))
  }

  /** The physical repeated corpus from an [[epochsToMixture]]
    * assignment: one row per (doc, epoch), epoch ∈ [1, n_epochs] —
    * in-row sequence explode, no join, no shuffle. */
  def materializeEpochs(assigned: DataFrame, idCol: String): DataFrame =
    assigned
      .filter(col("n_epochs") > 0)
      .select(col(idCol), col("n_epochs"),
        explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))

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

  /** Temperature-scaled mixture factors at T = 2: each source's
    * relative sampling weight is (n_s / n_max)^(1/T) — the standard
    * temperature flattening between proportional (T=1) and uniform
    * (T=∞), anchored to the LARGEST component so the factor reads
    * directly as "sample this source at X× its proportional share of
    * the biggest one" (the form a loader consumes, and the form that
    * needs NO cross-source normalizing sum — a Σ√p̂ denominator would
    * be an order-dependent double sum no hash gate can pin, while
    * √(n_s/n_max) is two exact IEEE operations on integers). T = 2 is
    * the common flattening AND the one whose power is exactly
    * computable (`sqrt` is correctly rounded by IEEE 754; a general
    * `pow(p, 1/T)` is only ~1-ulp portable — for other temperatures,
    * accept the last-ulp caveat or precompute factors driver-side).
    *
    * Scale shape: one partial-combining count to ≤ |sources| rows; the
    * max and the per-source arithmetic run in-row on one collected
    * row (the q139 discipline — no unpartitioned window, no 1-row
    * cross join). */
  def temperatureFactors(docs: DataFrame, sourceCol: String): DataFrame =
    docs
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .agg(max(col("n_docs")).as("__mx"),
        sort_array(collect_list(struct(col("source"), col("n_docs"))))
          .as("__arr"))
      .select(col("__mx"), explode(col("__arr")).as("e"))
      .select(col("e.source").as("source"),
        col("e.n_docs").as("n_docs"),
        round(sqrt(col("e.n_docs").cast("double") /
          col("__mx").cast("double")), 6).as("temp_factor"))
      .orderBy(col("source"))
}
