package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Additive sufficient-statistics LEDGER merge — the shared tail of
  * the O(new) report family ([[Ivf.incrementalCellHealth]],
  * [[Pq.incrementalQuantizationError]], and whatever ledger comes
  * next): prior ∪ delta by FULL OUTER join on the key, every sum
  * column adding with null-as-zero on BOTH sides. The full outer is
  * load-bearing, not style: a left join driven from the prior drops
  * any group the prior has never seen — which is every group on the
  * bootstrap day (empty stored ledger), so the ledger could never
  * start accumulating; and a join driven from the delta drops quiet
  * groups the batch didn't touch. Derived columns (averages) are the
  * caller's — they re-derive from the merged sums, they don't merge.
  * Exchanges are ledger-sized on both sides. */
private[graft] object Ledger {

  def merge(prior: DataFrame, delta: DataFrame, keyCol: String,
      sumCols: Seq[String]): DataFrame = {
    val p = prior.select(
      col(keyCol) +: sumCols.map(c => col(c).as(s"__p_$c")): _*)
    val d = delta.select(
      col(keyCol) +: sumCols.map(c => col(c).as(s"__d_$c")): _*)
    sumCols.foldLeft(p.join(d, Seq(keyCol), "full_outer")) { (df, c) =>
      df.withColumn(c,
        coalesce(col(s"__p_$c"), lit(0L)) +
          coalesce(col(s"__d_$c"), lit(0L)))
    }.select(col(keyCol) +: sumCols.map(col): _*)
  }

  /** RETRACTION — the ledger absorbing a DELETE: the delta's sums
    * SUBTRACT instead of add, so removing a slice of the indexed
    * corpus (right-to-be-forgotten, a decontamination verdict, a
    * source takedown) costs one O(deleted) scoring pass plus a
    * ledger-sized merge, never a history re-read. Additive sufficient
    * statistics are a group under +/−, which is the whole reason the
    * ledger family stores sums and re-derives averages: the same
    * full-outer spine serves append and delete. A key the prior never
    * saw subtracts from zero and goes negative — the loud wrong
    * answer (callers delete rows they previously ledgered; the
    * oracle's full recompute over the remaining corpus gates it). */
  def retract(prior: DataFrame, deleted: DataFrame, keyCol: String,
      sumCols: Seq[String]): DataFrame =
    merge(prior,
      sumCols.foldLeft(deleted) { (df, c) => df.withColumn(c, -col(c)) },
      keyCol, sumCols)
}
