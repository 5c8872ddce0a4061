package graft

import org.apache.spark.sql.functions._

/** SortedJaccardGe (the chargram verify kernel): survivor values
  * bit-identical to the portable intersect/union formulation, dead
  * pairs exactly -1.0, boundary (J == tau) kept, randomized agreement
  * against a reference set computation, and SQL-surface registration. */
class JaccardExprSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: jaccard over scala Sets with the same double division
    * the expression and the portable form both use. */
  private def refJac(a: Seq[Int], b: Seq[Int]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val inter = (sa & sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  test("survivors are bit-identical to the portable intersect/union form") {
    val df = Seq(
      (Seq(1, 2, 3, 4, 5), Seq(2, 3, 4, 5, 6)),   // J = 4/6
      (Seq(1, 2, 3), Seq(1, 2, 3)),               // J = 1
      (Seq(-5, -1, 7), Seq(-5, -1, 7, 9))         // negatives (ÿ-lead packs)
    ).toDF("a", "b")
    val rows = df.select(
      expr("jaccard_sorted_ge(a, b, 0.5)").as("fast"),
      (size(array_intersect($"a", $"b")).cast("double") /
        size(array_union($"a", $"b"))).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r)
    }
  }

  test("J exactly == tau is KEPT (early exit must not clip the boundary)") {
    // {1,2,3} vs {2,3,4}: inter 2, union 4 → J = 0.5 precisely
    val r = spark.sql(
      "SELECT jaccard_sorted_ge(array(1,2,3), array(2,3,4), 0.5) AS j")
      .first().getDouble(0)
    assert(r == 0.5)
  }

  test("below-threshold pairs return -1.0, including the disjoint fast path") {
    val rows = spark.sql(
      """SELECT jaccard_sorted_ge(array(1,2,3), array(2,3,4), 0.75) AS a,
        |       jaccard_sorted_ge(array(1,2,3), array(7,8,9), 0.1) AS b,
        |       jaccard_sorted_ge(CAST(array() AS ARRAY<INT>), array(1), 0.5)
        |         AS c""".stripMargin)
      .first()
    assert(rows.getDouble(0) == -1.0) // J=0.5 < 0.75
    assert(rows.getDouble(1) == -1.0) // disjoint
    assert(rows.getDouble(2) == -1.0) // empty side can never reach tau
  }

  test("null input yields null, not a crash") {
    val r = spark.sql(
      "SELECT jaccard_sorted_ge(CAST(NULL AS ARRAY<INT>), array(1), 0.5)")
      .first()
    assert(r.isNullAt(0))
  }

  test("a null ELEMENT yields NULL (public SQL surface; both codegen and eval)") {
    // SQL arrays holding NULL type as containsNull=true — the static
    // gate compiles the pre-scan in; a raw getInt on the null slot
    // would silently read garbage instead
    val r = spark.sql(
      """SELECT jaccard_sorted_ge(array(1, CAST(NULL AS INT), 3), array(1,3), 0.1) AS a,
        |       jaccard_sorted_ge(array(1,3), array(CAST(NULL AS INT)), 0.1) AS b,
        |       jaccard_sorted_ge(array(1,3), array(1,3), 0.1) AS c""".stripMargin)
      .first()
    assert(r.isNullAt(0), "null element on the left")
    assert(r.isNullAt(1), "null element on the right")
    assert(r.getDouble(2) == 1.0,
      "null-free rows of a containsNull-typed column still compute")
    // interpreted path, same contract
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val got = graft.functions.SortedJaccardGe(
      Literal.create(Array[java.lang.Integer](1, null, 3),
        ArrayType(IntegerType, containsNull = true)),
      Literal.create(Array(1, 3), ArrayType(IntegerType, containsNull = false)),
      0.1).eval(null)
    assert(got == null)
  }

  test("randomized agreement with the reference over 300 set pairs x 3 taus") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 300).map { _ =>
      def set() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30)).distinct.sorted
      (set(), set())
    }
    val df = pairs.toDF("a", "b")
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val got = df.select(expr(s"jaccard_sorted_ge(a, b, $tau)")).collect()
        .map(_.getDouble(0))
      pairs.zip(got).foreach { case ((a, b), g) =>
        val ref = refJac(a, b)
        val want = if (!ref.isNaN && ref >= tau) ref else -1.0
        assert(java.lang.Double.doubleToLongBits(g) ==
          java.lang.Double.doubleToLongBits(want),
          s"a=$a b=$b tau=$tau got=$g want=$want")
      }
    }
  }

  test("interpreted eval agrees with codegen") {
    // the interpreted path (eval over literal children), never touched
    // by DataFrame execution once whole-stage codegen kicks in
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    def ev(a: Seq[Int], b: Seq[Int]): Double =
      graft.functions.SortedJaccardGe(
        Literal.create(a.toArray, ArrayType(IntegerType)),
        Literal.create(b.toArray, ArrayType(IntegerType)), 0.5)
        .eval(null).asInstanceOf[Double]
    assert(ev(Seq(1, 2, 3), Seq(2, 3, 4)) == 0.5)
    assert(ev(Seq(1, 2, 3), Seq(7, 8, 9)) == -1.0)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      def set() = Seq.fill(rnd.nextInt(25))(rnd.nextInt(20)).distinct.sorted
      val (a, b) = (set(), set())
      val ref = refJac(a, b)
      val want = if (!ref.isNaN && ref >= 0.5) ref else -1.0
      assert(ev(a, b) == want, s"a=$a b=$b")
    }
  }
}
