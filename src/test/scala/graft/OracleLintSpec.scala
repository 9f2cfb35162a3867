package graft

/** Lint the driver contract itself: the correctness gate sorts columns
  * BY NAME before hashing, so a Spark output column that the oracle
  * spells differently (a missing `AS sum_qty`, a renamed aggregate)
  * fails the hash even when every value matches — historically the #1
  * way a green query went red. This spec runs every registered query at
  * sf0.001 and asserts each output column name appears verbatim in its
  * oracle SQL.
  */
class OracleLintSpec extends SparkSpec {

  test("every Spark output column is named in its oracle SQL") {
    val dir = "/root/testdata/sf0.001"
    val oracles = SparkEntry.oracleSql
    val problems = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        oracles.get(name).toSeq.flatMap { sql =>
          val lower = sql.toLowerCase
          fn(spark, dir).schema.fieldNames.toSeq
            .filterNot(c => lower.contains(c.toLowerCase))
            .map(c => s"$name: column `$c` not mentioned in oracle")
        }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("every query has an oracle or is a documented rows-only exception") {
    val rowsOnlyByDesign = Set.empty[String]
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("IVF oracle seeding stays in sync with Ivf.centroids") {
    // The q36/q76/q110 oracles unroll the engine's k-means and must
    // encode the SAME seeding rule as Ivf.centroids: the k SMALLEST
    // vec_ids ACTUALLY PRESENT in the clustered corpus
    // (Ivf.scala `orderBy(vec_id).limit(k)`), spelled in SQL as a
    // `vec_id IN (SELECT vec_id FROM <corpus> ORDER BY vec_id ASC
    // LIMIT k)` c0 CTE. If either side's seeding changes alone the
    // other silently diverges — this guard fails instead.
    //
    // Oracle side: each IVF oracle must contain the canonical c0 CTE,
    // seeding FROM the same corpus CTE it filters over (backreference).
    val seedRe =
      ("""c0 AS \(\s*SELECT vec_id AS cid, qvec AS cent FROM (\w+)\s+""" +
        """WHERE vec_id IN \(SELECT vec_id FROM \1 """ +
        """ORDER BY vec_id ASC LIMIT 8\)\)""").r
    val oracles = SparkEntry.oracleSql
    Seq("q36_ann_ivf", "q76_semantic_dedup", "q110_incremental_ivf")
      .foreach { name =>
        val sql = oracles.getOrElse(name, fail(s"$name has no oracle"))
        assert(seedRe.findFirstIn(sql).nonEmpty,
          s"$name oracle no longer contains the canonical smallest-k " +
            "seeding CTE — re-sync it with Ivf.centroids before changing " +
            "either side")
      }

    // The coarse-chain replays carry the same rule as a `co0` CTE —
    // helper-generated (coarseCtes) in q197/q198/q202, frozen inline
    // copies in q185/q186/q189. Guard all six so no copy drifts alone.
    val coSeedRe =
      ("""co0 AS \(SELECT vec_id AS cid, qvec AS cent FROM (\w+)\s+""" +
        """WHERE vec_id IN \(SELECT vec_id FROM \1\s+""" +
        """ORDER BY vec_id ASC LIMIT 8\)\)""").r
    Seq("q185_ivf_pq_topk", "q186_residual_ivf_pq", "q189_topic_census",
      "q197_residual_pq_index_append", "q198_ann_index_health",
      "q202_incremental_index_health")
      .foreach { name =>
        val sql = oracles.getOrElse(name, fail(s"$name has no oracle"))
        assert(coSeedRe.findFirstIn(sql).nonEmpty,
          s"$name oracle lost the canonical smallest-k coarse seeding " +
            "CTE — re-sync it with Ivf.centroids / coarseCtes")
      }

    // Engine side: zero-iteration centroids ARE the seeds; they must be
    // the smallest-k ids present — including on a filtered corpus (the
    // q110 history slice), where `vec_id < k` would under-seed.
    import org.apache.spark.sql.functions.col
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def seedIds(corpus: org.apache.spark.sql.DataFrame): Seq[Long] =
      graft.operators.Ivf.centroids(corpus, "vec_id", "embedding",
          k = 8, iterations = 0)
        .select("cid").collect().map(_.getLong(0)).sorted.toSeq
    def smallestPresent(corpus: org.apache.spark.sql.DataFrame): Seq[Long] =
      corpus.select(col("vec_id")).orderBy(col("vec_id").asc).limit(8)
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(seedIds(emb) == smallestPresent(emb))
    val history = emb.filter(col("vec_id") % 5 =!= 0)
    assert(seedIds(history) == smallestPresent(history),
      "seeding must pick the smallest ids PRESENT, not assume dense ids")
  }

  test("incremental oracles cannot drift from their batch twins") {
    // Every incremental-family query's oracle is by contract the PLAIN
    // full recompute — each hash match proves the O(new) path is a pure
    // optimization. That proof dies silently if the incremental oracle
    // and its batch twin's oracle are edited apart. Two tiers, per the
    // relations the suite actually maintains:
    //  - FULLY SHARED: the incremental gate recomputes the identical
    //    output over history ∪ batch, so the two oracles must stay
    //    textually identical (modulo whitespace);
    //  - SHARED FIRST CTE: output shapes differ, but the core
    //    normalization/tokenization CTE both chains hang off must stay
    //    verbatim-identical (the q66/q124 shared-prefix discipline).
    // Not covered (documented): q65/q116 vs q16 (the batch twin is a
    // bare SELECT, no CTE to share) and q110 vs q36 (the history slice
    // parameterizes the corpus CTE itself; the q36-seeding guard above
    // pins their shared k-means core instead).
    def norm(s: String) = s.replaceAll("\\s+", " ").trim
    val oracles = SparkEntry.oracleSql
    def oracle(name: String): String =
      oracles.getOrElse(name, fail(s"$name has no oracle"))
    Seq(
      "q144_incremental_dup_clusters" -> "q66_dup_clusters",
      "q147_incremental_inverted_index" -> "q92_inverted_index")
      .foreach { case (inc, bat) =>
        assert(norm(oracle(inc)) == norm(oracle(bat)),
          s"$inc's oracle must stay the verbatim full recompute of $bat")
      }
    def firstCte(sql: String): String = {
      val n = norm(sql)
      val start = n.indexOf("WITH ")
      assert(start >= 0, s"expected a WITH chain in: ${n.take(60)}…")
      val open = n.indexOf('(', start)
      var depth = 0
      var i = open
      while (i < n.length && (depth > 0 || i == open)) {
        if (n(i) == '(') depth += 1
        else if (n(i) == ')') depth -= 1
        i += 1
      }
      n.substring(start, i)
    }
    Seq(
      "q108_incremental_minhash" -> "q17_dedup_minhash_lsh",
      "q122_incremental_paragraph_dedup" -> "q117_paragraph_dedup",
      "q132_incremental_datasheet" -> "q131_corpus_datasheet",
      "q140_domain_quality_incremental" -> "q136_domain_quality")
      .foreach { case (inc, bat) =>
        val cte = firstCte(oracle(bat))
        assert(norm(oracle(inc)).contains(cte),
          s"$inc's oracle no longer contains $bat's first CTE verbatim — " +
            "re-sync the twins before changing either side")
      }
  }

  test("no registered query emits a DECIMAL output column") {
    // The driver's hash renders decimals float-style on one side and
    // scale-exact on the other, so ANY DecimalType output column
    // hash-fails whenever a value has a trailing zero at its scale
    // (judge r2: 8 such failures, plus q43 passing only by luck).
    // DECIMAL is for INTERNAL arithmetic (exact order-insensitive sums);
    // final outputs must be DOUBLE/BIGINT — render-stable in both engines.
    val dir = "/root/testdata/sf0.001"
    val problems = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, dir).schema.fields.toSeq
          .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
          .map(f => s"$name: output column `${f.name}` is ${f.dataType} " +
            "(driver hash renders decimals unstably — cast to double)")
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
