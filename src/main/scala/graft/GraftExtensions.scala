package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{KmvSketchAgg, LshProject, MinHashSig, SimHash32, VectorDot}

/** SparkSessionExtensions entry point: makes the library's native
  * Catalyst expressions first-class SQL functions and installs the
  * bounded-levenshtein optimizer rewrite. Production wiring:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * after which `SELECT vec_dot(a, b)`, `minhash_sig(words, k, h)`,
  * `simhash32(words, k)`, `lsh_project(vec, L, b, dims)` work in plain
  * SQL, and `levenshtein(a, b) <= t` predicates run the banded
  * early-exit algorithm (see [[graft.plans.BoundedLevenshteinRule]]).
  *
  * [[register]] applies the same pieces to an ALREADY-RUNNING session
  * (runtime FunctionRegistry + experimental.extraOptimizations) — the
  * path the specs exercise, since a shared test session cannot be
  * rebuilt with extension configs.
  *
  * NOTE: none of the gate queries depend on this — the driver may run
  * them in its own session with no extensions installed (SURVEY §7
  * driver-contract rule), so SQL-function ergonomics stay strictly
  * additive.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // 2-arg ctor: the richer ctors validate usage/extended formatting
  // (must embed _FUNC_, Examples sections) — noise for library functions
  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** (identifier, info, builder) triples for every native expression:
    * vec_dot(a, b); minhash_sig(words, k, numHashes);
    * simhash32(words, k); lsh_project(vec, L, b, dims). */
  def functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"), info("vec_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    (FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es(0),
        intLit(es(1), "shingleK"), intLit(es(2), "numHashes"))),
    (FunctionIdentifier("simhash32"), info("simhash32"),
      (es: Seq[Expression]) => SimHash32(es(0), intLit(es(1), "shingleK"))),
    // aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry in its AggregateExpression during resolution, so the
    // builder returns the function itself (same as Spark's built-ins)
    (FunctionIdentifier("kmv_sketch"), info("kmv_sketch"),
      (es: Seq[Expression]) => {
        // indexing alone would silently DROP extra arguments (the
        // vec_sum lesson below)
        require(es.length == 2,
          s"kmv_sketch takes exactly 2 arguments, got ${es.length}")
        KmvSketchAgg(es(0), intLit(es(1), "k"))
      }),
    (FunctionIdentifier("bounded_min_set"), info("bounded_min_set"),
      (es: Seq[Expression]) => {
        require(es.length == 2,
          s"bounded_min_set takes exactly 2 arguments, got ${es.length}")
        graft.functions.BoundedMinSetAgg(es(0), intLit(es(1), "k"))
      }),
    (FunctionIdentifier("vec_sum"), info("vec_sum"),
      (es: Seq[Expression]) => {
        // es(0) alone would silently DROP extra arguments
        require(es.length == 1,
          s"vec_sum takes exactly 1 argument, got ${es.length}")
        graft.functions.VecSumAgg(es.head)
      }),
    (FunctionIdentifier("lsh_project"), info("lsh_project"),
      (es: Seq[Expression]) => {
        val (l, b, d) = (intLit(es(1), "numTables"),
          intLit(es(2), "planesPerTable"), intLit(es(3), "dims"))
        LshProject(es(0), graft.operators.Similarity.planeCoefs(l, b, d), l, b, d)
      }))

  /** Install functions + the optimizer rule on a live session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.BoundedLevenshteinRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.BoundedLevenshteinRule
    }
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
  }
}
