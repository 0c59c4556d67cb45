package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native vector expressions: correctness vs the composed higher-order-
  * function form, float + double element types, null handling, SQL surface. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.0f, 0.0f, 1.0f), Array(0.0f, 1.0f, 0.0f)))
    .toDF("a", "b")

  test("vec_dot equals zip_with+aggregate composition") {
    val composed = aggregate(
      zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(VectorExpressions.vec_dot(col("a"), col("b")).as("fast"),
      composed.as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("vec_cosine: identical vectors → 1.0, orthogonal → 0.0") {
    val r = Seq((Array(1.0, 2.0), Array(1.0, 2.0)), (Array(1.0, 0.0), Array(0.0, 1.0)))
      .toDF("a", "b")
      .select(VectorExpressions.vec_cosine(col("a"), col("b"))).collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-15)
    assert(r(1).getDouble(0) == 0.0)
  }

  test("null input → null output") {
    val r = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(VectorExpressions.vec_dot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("SQL registration") {
    VectorExpressions.register(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_cosine(a, b) c FROM vecs ORDER BY c").collect()
    assert(r.length == 2 && r(0).getDouble(0) >= 0.0)
  }

  test("codegen and interpreted paths agree") {
    // force interpreted by wrapping in a non-codegen context: eval directly
    val e = CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0, 1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaPlan = Seq((Array(1.0, 2.0, 2.0), Array(2.0, 1.0, 2.0))).toDF("a", "b")
      .select(VectorExpressions.vec_cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(interpreted == viaPlan)
  }

  test("type mismatch rejected at analysis") {
    intercept[Exception] {
      Seq((Array(1, 2), Array(1.0, 2.0))).toDF("a", "b")
        .select(VectorExpressions.vec_dot(col("a"), col("b"))).collect()
    }
  }
}
