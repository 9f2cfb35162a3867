package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md scale notes; AQE handles much of this at
  * runtime, but explicit salting is the deterministic tool when one key
  * dominates — e.g. dedup buckets of a viral document, the `en` slice of
  * a language-partitioned corpus).
  *
  * Both operators are RESULT-EQUIVALENT to their unsalted forms (proved
  * by the oracle gate: q32 hash-matches a plain GROUP BY), they only
  * change the shuffle layout: the hot key is split across `numSalts`
  * reducers in phase 1 and merged in a phase 2 whose cardinality is the
  * number of distinct keys, not rows.
  */
object Salting {

  /** Deterministic salt in [0, numSalts): hash of a unique discriminator
    * column (NOT rand() — reproducibility is part of the contract). */
  def salt(discriminator: Column, numSalts: Int): Column =
    pmod(hash(discriminator), lit(numSalts))

  /** Two-phase salted aggregation: phase 1 aggregates (key, salt) —
    * spreading a hot key over `numSalts` reducers — phase 2 merges per
    * key. Partial aggregates must be re-aggregable (sum/count/min/max;
    * avg must be decomposed by the caller into sum+count). */
  def saltedAgg(df: DataFrame, keys: Seq[String], discriminator: Column,
      numSalts: Int, aggs: (String, String, String)*): DataFrame = {
    // aggs: (function, inputCol, outName), function ∈ sum|count|min|max
    def phase1Agg(f: String, in: String): Column = f match {
      case "count" => count(lit(1))
      case "sum" => sum(col(in))
      case "min" => min(col(in))
      case "max" => max(col(in))
    }
    def mergeAgg(f: String, out: String): Column = f match {
      case "count" | "sum" => sum(col(out))
      case "min" => min(col(out))
      case "max" => max(col(out))
    }
    val p1 = aggs.map { case (f, in, out) => phase1Agg(f, in).as(out) }
    val p2 = aggs.map { case (f, _, out) => mergeAgg(f, out).as(out) }
    df.withColumn("__salt", salt(discriminator, numSalts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(p1.head, p1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(p2.head, p2.tail: _*)
  }

  /** Skew-join: replicate the SMALL side across all salt values and salt
    * the big side deterministically, so one hot join key spreads over
    * `numSalts` tasks. Equi-join semantics preserved exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, discriminator: Column, numSalts: Int,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit numSalts copies of every unmatched
    // small-side row (it is replicated before the join) — only
    // big-side-preserving join types are equivalence-safe.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin does not preserve '$joinType' semantics: the small side " +
        "is replicated per salt, so unmatched small rows would duplicate")
    val saltedBig = big.withColumn("__salt", salt(discriminator, numSalts))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop("__salt")
  }
}
