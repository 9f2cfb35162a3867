package graft

import org.apache.spark.sql.functions._

/** SQL-surface integration: the native expressions as registered SQL
  * functions, and the bounded-levenshtein optimizer rewrite. Exercised
  * via [[GraftExtensions.register]] on the shared session (a live
  * session cannot be rebuilt with `spark.sql.extensions`; the
  * extension class and the runtime path share every builder). */
class GraftExtensionsSpec extends SparkSpec {

  private def withRegistered[A](body: => A): A = {
    GraftExtensions.register(spark)
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.BoundedLevenshteinRule)
    }
  }

  test("vec_dot / simhash32 / minhash_sig / lsh_project run from plain SQL") {
    withRegistered {
      assert(spark.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0) === 11.0)
      // SQL surface ≡ the operator path used by the dedup/ANN engine
      val words = "SELECT array('a','b','c','d') AS w"
      val viaSql = spark.sql(
        s"SELECT simhash32(w, 3) AS s, minhash_sig(w, 3, 6) AS m FROM ($words)")
        .collect().head
      val viaOps = {
        val df = spark.sql(words)
        import org.apache.spark.sql.graft.Bridge
        df.select(
          Bridge.column(graft.functions.SimHash32(
            Bridge.expression(col("w")), 3)).as("s"),
          Bridge.column(graft.functions.MinHashSig(
            Bridge.expression(col("w")), 3, 6)).as("m")).collect().head
      }
      assert(viaSql.getLong(0) === viaOps.getLong(0))
      assert(viaSql.getSeq[Long](1) === viaOps.getSeq[Long](1))
      val buckets = spark.sql(
        "SELECT lsh_project(array_repeat(0.5d, 64), 2, 4, 64) AS b")
        .collect().head.getSeq[Long](0)
      assert(buckets.length === 2)
      assert(buckets.forall(b => b >= 0 && b < 16))
      // vec_sum: the aggregate surface, grouped element-wise sum
      val sums = spark.sql(
        """SELECT g, vec_sum(v) AS s FROM VALUES
           (1, array(1.0d, 2.0d)), (1, array(10.0d, 20.0d)),
           (2, array(5.0d, 6.0d)) AS t(g, v)
           GROUP BY g ORDER BY g""").collect()
      assert(sums(0).getSeq[Double](1) === Seq(11.0, 22.0))
      assert(sums(1).getSeq[Double](1) === Seq(5.0, 6.0))
    }
  }

  test("levenshtein(a,b) <= t optimizes to the banded 3-arg form, same results") {
    withRegistered {
      val s = spark
      import s.implicits._
      // RDD-backed, NOT a literal Seq.toDF: ConvertToLocalRelation
      // would constant-fold the whole filter away before the rule's
      // rewrite is observable in the optimized plan
      val pairs = s.createDataFrame(s.sparkContext.parallelize(Seq(
        ("kitten", "sitting"), ("abc", "abc"),
        ("aaaaaaaaaa", "bbbbbbbbbb"), ("flaw", "lawn")))).toDF("a", "b")
      val filtered = pairs.filter(levenshtein($"a", $"b") <= 3)
      val optimized = filtered.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Some(3)) >= 0"), optimized)
      assert(filtered.collect().map(_.getString(0)).sorted.toSeq ===
        Seq("abc", "flaw", "kitten"))
      // strict < rewrites with t-1
      val strict = pairs.filter(levenshtein($"a", $"b") < 3)
        .queryExecution.optimizedPlan.toString
      assert(strict.contains("Some(2)) >= 0"), strict)
    }
  }

  test("the rule leaves non-literal and negative thresholds alone") {
    withRegistered {
      val s = spark
      import s.implicits._
      val pairs = s.createDataFrame(s.sparkContext.parallelize(
        Seq(("kitten", "sitting", 3)))).toDF("a", "b", "t")
      val nonLit = pairs.filter(levenshtein($"a", $"b") <= $"t")
        .queryExecution.optimizedPlan.toString
      assert(!nonLit.contains(">= 0"), nonLit)
      val neg = pairs.filter(levenshtein($"a", $"b") <= -1)
      assert(neg.count() === 0)
    }
  }
}
