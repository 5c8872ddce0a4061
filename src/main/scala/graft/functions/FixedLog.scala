package graft.functions

/** Exact fixed-point log2 over positive integers, shared by a Spark
  * SQL rendering and a DuckDB rendering so probabilistic scores built
  * from it hash-match across engines bit-for-bit.
  *
  * `llog(n) = floor(256 * log2(n))` up to a deterministic one-sided
  * error of at most 2/256 bit (8-bit mantissa truncation plus the
  * table floor, both downward), computed with INTEGER arithmetic only:
  *
  *   llog(n) = 256 * (bitlen(n) - 1) + L[mantissa8(n)]
  *
  * where `bitlen(n) = length(bin(n))`, `mantissa8(n)` is the 8 bits
  * after the leading 1 (the number renormalized into [256, 512)), and
  * `L[k] = floor(256 * log2(1 + k/256))` is a 256-entry lookup table.
  * The table is generated ONCE here (the only floating-point step) and
  * embedded as the same integer literals into both dialects, so no
  * engine ever evaluates a transcendental — 1/256-bit precision with
  * zero cross-engine drift, where the whole-bit `length(bin(n))`
  * quantization (tx_lm_score) is too coarse: class-conditional
  * probability ratios in a Naive Bayes model are routinely sub-bit,
  * and whole-bit scores let the length-normalizer term swamp them.
  *
  * Scale note: callers should apply this to MODEL tables (bounded:
  * hash buckets × classes), never per corpus token — the per-token
  * pass then sums precomputed integers.
  */
object FixedLog {
  /** L[k] = floor(256 * log2(1 + k/256)), k = 0..255. */
  val Table: IndexedSeq[Int] = (0 until 256).map(k =>
    math.floor(256.0 * math.log(1.0 + k / 256.0) / math.log(2.0)).toInt)

  private val tableList = Table.mkString(", ")

  /** Spark SQL rendering (for `expr(...)`); `x` must be a SQL
    * expression evaluating to a positive integral value. The argument
    * is interpolated several times — pass a simple column/arithmetic
    * expression, not a subquery. */
  def spark(x: String): String =
    s"(256 * (length(bin($x)) - 1) + element_at(array($tableList), CAST(" +
      s"CASE WHEN length(bin($x)) > 9 THEN ($x) div CAST(pow(2, length(bin($x)) - 9) AS BIGINT) - 256" +
      s" ELSE ($x) * CAST(pow(2, 9 - length(bin($x))) AS BIGINT) - 256 END AS INT) + 1))"

  /** DuckDB rendering — identical arithmetic, DuckDB spellings
    * (`//` for integral division, `list_extract` for 1-based lookup;
    * both dialects agree on `//`/`div` for the positive operands used
    * here). */
  def duck(x: String): String =
    s"(256 * (length(bin($x)) - 1) + list_extract([$tableList], CAST(" +
      s"CASE WHEN length(bin($x)) > 9 THEN ($x) // CAST(pow(2, length(bin($x)) - 9) AS BIGINT) - 256" +
      s" ELSE ($x) * CAST(pow(2, 9 - length(bin($x))) AS BIGINT) - 256 END AS INT) + 1))"

  /** Reference implementation (for specs). */
  def apply(n: Long): Long = {
    require(n >= 1, s"llog needs n >= 1, got $n")
    val b = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val idx = if (b > 9) (n >> (b - 9)) - 256 else (n << (9 - b)) - 256
    256L * (b - 1) + Table(idx.toInt)
  }
}
