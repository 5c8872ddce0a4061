package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Native vector expressions (vec_dot / vec_cosine): bit-exact
  * agreement with the portable aggregate-HOF formulation, null
  * semantics, mixed element types, and codegen presence. */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2, Array(-1.5f, 0.25f, 8.0f), Array(0.5f, -2.0f, 1.0f)),
    (3, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  private val hofDot =
    "aggregate(sequence(1, 3), CAST(0.0 AS DOUBLE), " +
      "(acc, i) -> acc + CAST(element_at(a, i) AS DOUBLE) * CAST(element_at(b, i) AS DOUBLE))"

  test("vec_dot is bit-identical to the aggregate-HOF left fold") {
    val rows = df.select(
      expr("vec_dot(a, b)").as("fast"),
      expr(hofDot).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_cosine matches dot / norms composition exactly") {
    val rows = df.filter($"id" =!= 3).select(
      expr("vec_cosine(a, b)").as("fast"),
      expr("vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double element types are accepted") {
    val v = df.select(expr(
      "vec_dot(b, array(1.0D, 1.0D, 1.0D))").as("s")).collect()
    assert(v.map(_.getDouble(0)).max == 15.0) // 4+5+6
  }

  test("null input yields null, not a crash") {
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("non-array input is rejected at analysis time") {
    val e = intercept[Exception](df.select(expr("vec_dot(id, a)")).collect())
    assert(e.getMessage.toLowerCase.contains("vec_dot") ||
      e.getMessage.toLowerCase.contains("array"))
  }

  test("interpreted eval path agrees with codegen") {
    import graft.functions.VecDot
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit = (xs: Array[Float]) =>
      Literal(ArrayData.toArrayData(xs), ArrayType(FloatType))
    val v = VecDot(lit(Array(1f, 2f, 3f)), lit(Array(4f, 5f, 6f))).eval(null)
    assert(v == 32.0)
  }

  test("the physical plan stays inside whole-stage codegen") {
    // repartition defeats ConvertToLocalRelation (which would evaluate
    // the projection at optimization time); execute first so AQE
    // finalizes the plan before inspecting it
    val q = df.repartition(2).select(expr("vec_cosine(a, b)"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the `*(N)` prefix is the WholeStageCodegen marker in tree strings
    assert("""\*\(\d+\) Project \[vec_cosine""".r.findFirstIn(plan).isDefined, plan)
  }
}

/** vec_sign_bucket: bit-identical to the literal-inlined SQL
  * formulation it replaced, on random vectors, in both codegen and
  * interpreted modes. */
class VecSignBucketSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.VectorFunctions.planeCoeffs

  private val dim = 64
  private val nPlanes = 12
  private val offset = 3 // non-zero: the banded scheme uses offsets

  /** The pre-native rendering: one vec_dot against inlined literals
    * per plane. Kept here verbatim as the reference semantics. */
  private def literalSql(emb: String): String = {
    val bits = (0 until nPlanes).map { j =>
      val arr = planeCoeffs(offset + j, dim).map(c => s"${c}.0D")
        .mkString("array(", ", ", ")")
      s"CASE WHEN vec_dot($emb, $arr) >= 0 THEN '1' ELSE '0' END"
    }
    s"concat(${bits.mkString(", ")})"
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(20260813)
    (1 to 200).map(i => (i.toLong,
      Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("native signature equals the inlined-literal formulation bit-for-bit") {
    val mismatches = vecs.select(
      expr(s"vec_sign_bucket(embedding, $dim, $nPlanes, $offset)").as("fast"),
      expr(literalSql("embedding")).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatches == 0)
  }

  test("interpreted eval agrees with codegen") {
    val e = graft.functions.VecSignBucket(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, -2.0f, 0.5f) ++ Array.fill(dim - 3)(0.25f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      dim, nPlanes, offset)
    val interp = e.eval(null).toString
    val viaSql = vecs.limit(0).sparkSession.range(1).select(
      expr(s"vec_sign_bucket(" +
        s"array(${(Array(1.0f, -2.0f, 0.5f) ++ Array.fill(dim - 3)(0.25f)).map(v => s"CAST($v AS FLOAT)").mkString(",")}), " +
        s"$dim, $nPlanes, $offset)").as("b")).head().getString(0)
    assert(interp == viaSql)
  }
}
