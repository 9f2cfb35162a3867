package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorDotSpec extends SparkSpec {

  test("native VectorDot is bit-identical to the composed fold") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < 20 && col("b.vec_id") < 20)
      .select(
        VectorFunctions.dot(col("a.embedding"), col("b.embedding")).as("native"),
        VectorFunctions.dotComposed(
          VectorFunctions.asDouble(col("a.embedding")),
          VectorFunctions.asDouble(col("b.embedding"))).as("composed"))
    assert(both.filter(col("native") =!= col("composed")).isEmpty)
    assert(both.count() == 400)
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    val s = spark
    import s.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0)
    assert(got == 32.0)
  }

  test("vec_dot is SQL-callable after runtime registration") {
    org.apache.spark.sql.graft.Bridge.registerTempFunction(spark, "vec_dot",
      exprs => VectorDot(exprs(0), exprs(1)))
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
