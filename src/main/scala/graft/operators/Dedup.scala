package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.normText

/** Document deduplication operators for training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Design rules (these must survive 100 TB):
  *  - NO pairwise cartesian anywhere — every near-dup algorithm
  *    generates candidate pairs through an equi-join on a blocking key
  *    (LSH band hash / sign bucket / 1-perm min-hash), i.e. one shuffle
  *    on the key, then verifies only the candidates;
  *  - hashing is md5-based (built-in, codegen'd, and available in
  *    DuckDB so every operator is oracle-verifiable bit-for-bit);
  *  - signatures are computed in a single projection pass with
  *    higher-order array functions (transform/aggregate) — no explode
  *    of the shingle set into a row-multiplied intermediate for the
  *    signature path.
  */
object Dedup {

  /** Word n-gram shingle set (distinct) of the canonical text. */
  def withShingles(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    docs
      .withColumn("_words", split(normText(col(textCol)), " "))
      .withColumn("shingles", array_distinct(transform(
        sequence(lit(1), greatest(size(col("_words")) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(col("_words"), i, lit(n))))))
      .drop("_words")

  /** Exact dedup: group by canonical-content hash, keep the smallest
    * id as the representative, report group size. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(normText(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: k independent permutations emulated as
    * min(md5(seed:shingle)) over the shingle set — string-min of a
    * uniformly distributed hex hash is a valid min-hash. */
  def minhashSignatures(shingled: DataFrame, k: Int = 16): DataFrame =
    shingled.withColumn("sig", transform(
      sequence(lit(0), lit(k - 1)),
      j => array_min(transform(col("shingles"),
        s => md5(concat(j.cast("string"), lit(":"), s))))))

  /** LSH banding: split the k-length signature into bands of r rows;
    * docs sharing any band hash become candidate pairs (one equi-join
    * shuffle on (band, hash) — never a cartesian). Pairs are verified
    * with exact Jaccard over the shingle sets. */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4,
                      minJaccard: Double = 0.5): DataFrame = {
    val r = k / bands
    val sigs = minhashSignatures(withShingles(docs, n = n), k = k)
      .select(col("doc_id"), col("shingles"), col("sig"))
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * r + 1, lit(r)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  private val hexChars = "0123456789abcdef"
  /** popcount lookup for a 4-bit value v: '0112122312232334'[v]. */
  private val popLookup = "0112122312232334"

  /** 64-bit SimHash as a 16-hex-digit string, built from per-word md5
    * digests: every hex digit position contributes 4 bit-votes weighted
    * by word frequency (each occurrence votes). Pure SQL expressions so
    * the oracle reproduces it exactly. */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = docs.select(
      col(idCol).as("doc_id"),
      explode(split(normText(col(textCol)), " ")).as("w"))
      .withColumn("m", md5(col("w")))
    // vote_{g}_{j}: sum over words of ±1 for bit j of hex digit g.
    val votes = (1 to 16).flatMap { g =>
      (0 to 3).map { j =>
        val d = s"(instr('$hexChars', substr(m, $g, 1)) - 1)"
        sum(expr(s"(($d div ${1 << j}) % 2) * 2 - 1")).as(s"v_${g}_$j")
      }
    }
    val agg = words.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val digits = (1 to 16).map { g =>
      val dig = (0 to 3).map { j =>
        s"(CASE WHEN v_${g}_$j > 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      expr(s"substr('$hexChars', ($dig) + 1, 1)")
    }
    agg.select(col("doc_id"), concat(digits: _*).as("simhash"))
  }

  /** SimHash near-dup candidate pairs: block on 4-hex-digit bands
    * (docs agreeing on any 16-bit quarter of the signature), then
    * compute the exact 64-bit Hamming distance per candidate pair and
    * keep pairs under the threshold. */
  def simhashPairs(sims: DataFrame, maxHamming: Int = 16): DataFrame = {
    val banded = sims.select(
      col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), b -> substr(simhash, b * 4 + 1, 4))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bk")
    val a = banded.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"), col("band"), col("bk"))
    val b = banded.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"), col("band"), col("bk"))
    a.join(b, Seq("band", "bk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), expr(hammingExpr("sh_a", "sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming distance between two 16-hex-digit signatures, as a column
    * expression valid in Spark SQL (uses ^ for xor). */
  def hammingExpr(a: String, b: String): String =
    (1 to 16).map { g =>
      val da = s"(instr('$hexChars', substr($a, $g, 1)) - 1)"
      val db = s"(instr('$hexChars', substr($b, $g, 1)) - 1)"
      s"CAST(substr('$popLookup', ($da ^ $db) + 1, 1) AS INT)"
    }.mkString(" + ")

  /** Character n-gram Jaccard near-dup: block on (1-perm min-hash of
    * the gram set, length bucket), verify candidates exactly.
    *
    * Two guards keep this sub-quadratic on corpora with heavy shared
    * vocabulary (where the globally-min gram lands in most docs and a
    * bare min-hash block degenerates toward all-pairs):
    *  - the 64-char length bucket in the block key — docs of very
    *    different length can't reach J >= 0.8 anyway, and the oracle
    *    replicates the key so results stay exact;
    *  - a size-ratio pre-filter before the expensive intersection:
    *    J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so dropping pairs whose
    *    bound is below the threshold is LOSSLESS for the thresholded
    *    output while skipping the array work for most candidates. */
  def charGramPairs(docs: DataFrame, n: Int = 4, minJaccard: Double = 0.8): DataFrame = {
    val grams = docs
      .withColumn("t", normText(col("text")))
      .withColumn("grams", array_distinct(expr(
        s"transform(sequence(1, greatest(length(t) - ${n - 1}, 1)), i -> substr(t, i, $n))")))
      .withColumn("block", concat(
        expr("array_min(transform(grams, g -> md5(g)))"),
        lit(":"), expr("length(t) div 64")))
      .select(col("doc_id"), col("grams"), col("block"))
    // candidate generation joins only (id, set-size, block) — the gram
    // arrays are fetched AFTER the size-bound filter, so the wide rows
    // never shuffle for pairs that can't pass the threshold.
    val slim = grams.select(col("doc_id"), size(col("grams")).as("sz"), col("block"))
    val a = slim.select(col("doc_id").as("id_a"), col("sz").as("sz_a"), col("block"))
    val b = slim.select(col("doc_id").as("id_b"), col("sz").as("sz_b"), col("block"))
    val cands = a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      .filter( // lossless Jaccard upper bound on set sizes
        least(col("sz_a"), col("sz_b")).cast("double") /
          greatest(col("sz_a"), col("sz_b")) >= minJaccard)
      .select("id_a", "id_b").distinct()
    val ga = grams.select(col("doc_id").as("id_a"), col("grams").as("g_a"))
    val gb = grams.select(col("doc_id").as("id_b"), col("grams").as("g_b"))
    cands.join(ga, "id_a").join(gb, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
