package graft.functions

import java.security.MessageDigest

/** Vector similarity primitives over `Array[Float]` embedding columns.
  *
  * The Spark side uses the native codegen'd expressions (VecDot /
  * VecCosine, registered as `vec_dot` / `vec_cosine` via
  * GraftExtensions); the DuckDB side renders the equivalent explicit
  * left fold. Determinism contract: every float is cast to double
  * BEFORE any arithmetic, and each accumulator is a left fold in index
  * order — both engines produce bit-identical doubles, so even
  * approximate ANN variants are oracle-verifiable exactly.
  */
object VectorFunctions {

  /** Spark SQL: dot product of two array columns (native expression). */
  def dotSql(a: String, b: String, dim: Int): String = s"vec_dot($a, $b)"

  /** DuckDB: the equivalent left-fold dot product. */
  def dotDuck(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  def cosineSql(a: String, b: String, dim: Int): String = s"vec_cosine($a, $b)"

  def cosineDuck(a: String, b: String, dim: Int): String =
    s"${dotDuck(a, b, dim)} / (sqrt(${dotDuck(a, a, dim)}) * sqrt(${dotDuck(b, b, dim)}))"

  /** ±1 hyperplane coefficients for plane j over dims 1..dim.
    *
    * Derived from an md5 parity — deterministic, engine-independent —
    * but computed ONCE at planning time and inlined as literals. (An
    * earlier formulation evaluated `md5(concat(j, '_', i))` inside the
    * per-row fold: dim × nPlanes digests per ROW for what is a
    * constant matrix. At corpus scale that is the whole scan cost.)
    * Parity matches the SQL `(instr('0123456789abcdef',
    * substr(md5(j||'_'||i), 1, 1)) - 1) % 2 * 2 - 1`. */
  private[graft] def planeCoeffs(j: Int, dim: Int): IndexedSeq[Int] =
    (1 to dim).map { i =>
      val digest = MessageDigest.getInstance("MD5")
        .digest(s"${j}_$i".getBytes("UTF-8"))
      val firstHexDigit = (digest(0) >> 4) & 0xf
      (firstHexDigit % 2) * 2 - 1
    }

  /** Spark SQL: random-hyperplane sign bucket (nPlanes-bit string).
    * Vectors with equal buckets are ANN candidates — bucketing is a
    * pure projection, candidates come from an equi-join on the bucket,
    * so the search is one shuffle and never a cartesian. The plane
    * matrix is inlined as double literals; the projection itself is
    * the native vec_dot. `offset` selects a disjoint plane family —
    * band b of a banded scheme uses offset b*nPlanes, so bands are
    * independent hash functions drawn from the same deterministic
    * stream. */
  def signBucketSql(emb: String, dim: Int, nPlanes: Int, offset: Int = 0): String =
    // the native expression (VecSignBucket) — the literal-inlined
    // `concat(CASE WHEN vec_dot(emb, array(...)) ...)` formulation it
    // replaces produced nPlanes·dim literal nodes, whose analysis +
    // Janino compile cost the driver measurable wall-clock on every
    // ANN query run; results are bit-identical (same planeCoeffs
    // stream, same fold order)
    s"vec_sign_bucket($emb, $dim, $nPlanes, $offset)"

  /** DuckDB: the same sign bucket from the same inlined literals. */
  def signBucketDuck(emb: String, dim: Int, nPlanes: Int, offset: Int = 0): String = {
    val bits = (0 until nPlanes).map { j =>
      val coeffs = planeCoeffs(offset + j, dim)
      val proj = s"list_reduce(list_transform(range(1, ${dim + 1}), " +
        s"i -> CAST($emb[i] AS DOUBLE) * ([${coeffs.mkString(", ")}][i])), (x, y) -> x + y)"
      s"CASE WHEN $proj >= 0 THEN '1' ELSE '0' END"
    }
    s"concat(${bits.mkString(", ")})"
  }

  /** Multi-probe set for a sign bucket: the bucket itself plus every
    * bucket within Hamming distance 2 — 1 + n + n(n-1)/2 probes. The
    * probe count grows O(nPlanes²) while the bucket count grows
    * 2^nPlanes, so the probed FRACTION of the index shrinks as the
    * corpus (and with it the adaptive plane count) grows: 22/64 probes
    * at 6 planes, 301/16.7M at 24 planes. This is what makes
    * plane-count scaling recall-safe — extra planes sharpen buckets
    * without starving the candidate set. */
  def probeArraySql(bucketCol: String, nPlanes: Int): String = {
    val flipSets: Seq[Seq[Int]] =
      Seq(Seq.empty[Int]) ++
        (1 to nPlanes).map(Seq(_)) ++
        (for { i <- 1 to nPlanes; j <- i + 1 to nPlanes } yield Seq(i, j))
    val probes = flipSets.map {
      case Seq() => bucketCol
      case fs =>
        val chars = (1 to nPlanes).map { pos =>
          if (fs.contains(pos))
            s"(CASE WHEN substr($bucketCol, $pos, 1) = '1' THEN '0' ELSE '1' END)"
          else s"substr($bucketCol, $pos, 1)"
        }
        s"concat(${chars.mkString(", ")})"
    }
    s"array(${probes.mkString(", ")})"
  }

  /** DuckDB: the same Hamming≤2 probe set as [[probeArraySql]], so an
    * oracle can rebuild a multi-probe index bit-for-bit. */
  def probeArrayDuck(bucketCol: String, nPlanes: Int): String = {
    val flipSets: Seq[Seq[Int]] =
      Seq(Seq.empty[Int]) ++
        (1 to nPlanes).map(Seq(_)) ++
        (for { i <- 1 to nPlanes; j <- i + 1 to nPlanes } yield Seq(i, j))
    val probes = flipSets.map {
      case Seq() => bucketCol
      case fs =>
        val chars = (1 to nPlanes).map { pos =>
          if (fs.contains(pos))
            s"(CASE WHEN substr($bucketCol, $pos, 1) = '1' THEN '0' ELSE '1' END)"
          else s"substr($bucketCol, $pos, 1)"
        }
        s"concat(${chars.mkString(", ")})"
    }
    s"[${probes.mkString(", ")}]"
  }

  /** Probed fraction of the bucket space under Hamming≤2 multi-probe. */
  def probeFraction(nPlanes: Int): Double =
    (1.0 + nPlanes + nPlanes * (nPlanes - 1) / 2.0) / math.pow(2.0, nPlanes)
}
