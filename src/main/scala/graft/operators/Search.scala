package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index operators: posting-list construction and conjunctive
  * term search over the document corpus — the retrieval side of a
  * training-data pipeline (decontamination lookups, corpus search,
  * targeted subset extraction).
  *
  * Scale design: the index build is one explode + one aggregation —
  * (token, doc) pairs partial-combine map-side, and the posting arrays
  * are CAPPED (`maxPostings`) so no single row grows with corpus size;
  * df/cf keep the full counts. Conjunctive search never materializes
  * posting lists at all: it filters the token stream to the query terms
  * BEFORE the shuffle (the decontamination discipline — only matching
  * rows cross the wire) and intersects via a groupBy counting distinct
  * matched terms.
  */
object Search {

  /** Posting-list snapshot per token: (token, df, cf, postings) where
    * df = documents containing the token, cf = total occurrences, and
    * postings = the first `maxPostings` doc ids ascending. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      maxPostings: Int): DataFrame = {
    val toks = docs
      .select(col(idCol), Dedup.words(col(textCol)).as("w"))
      .select(col(idCol), explode(col("w")).as("token"))
    toks
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("cf"),
        count_distinct(col(idCol)).as("df"),
        slice(sort_array(collect_set(col(idCol))), 1, maxPostings)
          .as("postings"))
      .select(col("token"), col("df"), col("cf"), col("postings"))
  }

  /** Documents containing ALL `terms`, scored by total term frequency.
    * Output: (idCol, tf_total, rnk). The token stream is filtered to
    * the query terms before any exchange, so the shuffle carries only
    * (matching-token, doc) pairs — O(hits), not O(corpus tokens). */
  def conjunctiveSearch(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty, "conjunctiveSearch needs at least one term")
    val toks = docs
      .select(col(idCol), Dedup.words(col(textCol)).as("w"))
      .select(col(idCol), explode(col("w")).as("token"))
      .filter(col("token").isin(terms: _*))
    val ord = Seq(col("tf_total").desc, col(idCol).asc)
    toks
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("tf_total"),
        count_distinct(col("token")).as("n_terms"))
      .filter(col("n_terms") === terms.distinct.size)
      .select(col(idCol), col("tf_total"))
      .orderBy(ord: _*)
      .limit(topN)
      .withColumn("rnk", row_number().over(Window.orderBy(ord: _*)))
  }
}
