package graft.functions

/** Vector similarity primitives over `Array[Float]` embedding columns,
  * as SQL expression strings shared between the Spark plan and the
  * DuckDB oracle rendering.
  *
  * Determinism contract: every float is cast to double BEFORE any
  * arithmetic, and sums are explicit left folds — both engines then
  * produce bit-identical doubles, so even approximate ANN variants are
  * oracle-verifiable exactly. (A future Catalyst `Expression` with
  * `doGenCode` could fuse the dot product into one loop; the built-in
  * `aggregate` HOF already stays inside codegen, so that is a
  * micro-optimization, not a scalability need.)
  */
object VectorFunctions {

  /** Spark SQL: dot product of two array<float> columns (left fold). */
  def dotSql(a: String, b: String, dim: Int): String =
    s"aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE), " +
      s"(acc, i) -> acc + CAST(element_at($a, i) AS DOUBLE) * CAST(element_at($b, i) AS DOUBLE))"

  /** DuckDB: the same left-fold dot product. */
  def dotDuck(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  def cosineSql(a: String, b: String, dim: Int): String =
    s"${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)}))"

  def cosineDuck(a: String, b: String, dim: Int): String =
    s"${dotDuck(a, b, dim)} / (sqrt(${dotDuck(a, a, dim)}) * sqrt(${dotDuck(b, b, dim)}))"

  /** ±1 hyperplane coefficient for plane j, dimension i — derived from
    * an md5 parity so both engines generate identical planes with no
    * RNG. `i` is the lambda variable name in scope. */
  private def coeff(j: Int): String =
    s"CAST((instr('0123456789abcdef', substr(md5(concat('${j}_', i)), 1, 1)) - 1) % 2 * 2 - 1 AS DOUBLE)"

  /** Spark SQL: random-hyperplane sign bucket (nPlanes-bit string).
    * Vectors with equal buckets are ANN candidates — bucketing is a
    * pure projection, candidates come from an equi-join on the bucket,
    * so the search is one shuffle and never a cartesian. */
  def signBucketSql(emb: String, dim: Int, nPlanes: Int): String = {
    val bits = (0 until nPlanes).map { j =>
      val proj = s"aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE), " +
        s"(acc, i) -> acc + CAST(element_at($emb, i) AS DOUBLE) * ${coeff(j)})"
      s"CASE WHEN $proj >= 0 THEN '1' ELSE '0' END"
    }
    s"concat(${bits.mkString(", ")})"
  }

  /** DuckDB: the same sign bucket. */
  def signBucketDuck(emb: String, dim: Int, nPlanes: Int): String = {
    val bits = (0 until nPlanes).map { j =>
      val proj = s"list_reduce(list_transform(range(1, ${dim + 1}), " +
        s"i -> CAST($emb[i] AS DOUBLE) * ${coeff(j)}), (x, y) -> x + y)"
      s"CASE WHEN $proj >= 0 THEN '1' ELSE '0' END"
    }
    s"concat(${bits.mkString(", ")})"
  }
}
