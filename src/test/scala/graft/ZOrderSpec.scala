package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-order layout: unit-test the Morton code arithmetic, then prove the
  * clustering property that makes the layout worth paying for — under a
  * 2-D box predicate, far fewer files of the Z-ordered layout intersect
  * the box (by parquet-visible min/max bounds) than of a 1-D sorted
  * layout. File-level min/max is exactly what parquet row-group stats
  * expose to the scan, so "fewer intersecting files" IS "more skipped
  * row groups" at scale. */
class ZOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("morton2 interleaves bits (known values)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
                   (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL),
                   (0xF0F0L, 0x0F0FL))
      .toDF("x", "y")
      .select(ZOrder.morton2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // reference values from the textbook bit-by-bit definition
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) |
                            (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val expect = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
                     (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL),
                     (0xF0F0L, 0x0F0FL)).map { case (x, y) => ref(x, y) }
    assert(rows == expect)
  }

  test("morton2 matches the bit-by-bit reference on 512 random pairs; " +
       "per-coordinate order is preserved") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) |
                            (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(512)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(ZOrder.morton2(col("x"), col("y")).as("z")).as[Long].collect()
    pairs.zip(got).foreach { case ((x, y), z) => assert(z == ref(x, y), s"($x,$y)") }
    // fixing one coordinate, the PRODUCTION code is strictly monotone in
    // the other — the property that makes min/max ranges on the code
    // meaningful. Evaluated through morton2 itself, not the local ref.
    val xs = pairs.map(_._1).distinct.sorted
    for (c <- Seq(0L, 1L, 37L, 65535L)) {
      val inX = xs.toDF("x")
        .select(ZOrder.morton2(col("x"), lit(c)).as("z")).as[Long].collect().toSeq
      val inY = xs.toDF("y")
        .select(ZOrder.morton2(lit(c), col("y")).as("z")).as[Long].collect().toSeq
      assert(inX == inX.sorted && inX.distinct.size == inX.size, s"x-monotone c=$c")
      assert(inY == inY.sorted && inY.distinct.size == inY.size, s"y-monotone c=$c")
    }
  }

  test("morton3 matches the bit-by-bit reference on 512 random triples") {
    import spark.implicits._
    def ref3(x: Long, y: Long, z: Long): Long =
      (0 until 21).map(i => (((x >> i) & 1L) << (3 * i)) |
                            (((y >> i) & 1L) << (3 * i + 1)) |
                            (((z >> i) & 1L) << (3 * i + 2))).reduce(_ | _)
    val rnd = new scala.util.Random(7)
    def r() = rnd.nextInt(1 << 21).toLong
    val triples = Seq.fill(512)((r(), r(), r())) ++
      Seq((0L, 0L, 0L), (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL), (1L, 0L, 0L), (0L, 0L, 1L))
    val got = triples.toDF("x", "y", "z")
      .select(ZOrder.morton3(col("x"), col("y"), col("z")).as("m")).as[Long].collect()
    triples.zip(got).foreach { case ((x, y, z), m) =>
      assert(m == ref3(x, y, z), s"($x,$y,$z)") }
  }

  test("bucket16 clamps to [0, 65535] and survives a degenerate span") {
    import spark.implicits._
    val got = Seq(5L, 10L, 20L, 99L).toDF("v")
      .select(
        ZOrder.bucket16(col("v"), 10L, 20L).as("b"),     // 5 below mn, 99 above mx
        ZOrder.bucket16(col("v"), 7L, 7L).as("flat"))    // mn == mx: span clamps to 1
      .as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 0L, 65535L, 65535L), got.mkString(","))
    assert(got.forall(p => p._2 >= 0L && p._2 <= 65535L), got.mkString(","))
  }

  test("morton2 ordering preserves 2-D locality vs 1-D sort (file pruning)") {
    val t = graft.core.Tables(spark, dir).lineitem
      .select("l_partkey", "l_suppkey", "l_extendedprice")
    val b = t.agg(min("l_partkey"), max("l_partkey"),
                  min("l_suppkey"), max("l_suppkey")).head()
    val (pMn, pMx, sMn, sMx) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))

    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_spec"
    // layout A: Z-ordered on (partkey, suppkey)
    t.withColumn("_z", ZOrder.morton2(
        ZOrder.bucket16(col("l_partkey"), pMn, pMx),
        ZOrder.bucket16(col("l_suppkey"), sMn, sMx)))
      .repartitionByRange(16, col("_z")).sortWithinPartitions("_z").drop("_z")
      .write.mode("overwrite").parquet(s"$tmp/z")
    // layout B: 1-D sort on partkey only (what a naive ORDER BY gives)
    t.repartitionByRange(16, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lin")

    // per-file [min,max] of both dims — the same stats parquet row
    // groups carry; a file whose box misses the predicate box is a
    // file a stats-pruning scan never opens
    def fileBoxes(path: String): (Array[(Long, Long, Long, Long)], Int) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("l_partkey").as("pmn"), max("l_partkey").as("pmx"),
             min("l_suppkey").as("smn"), max("l_suppkey").as("smx"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      (perFile, perFile.length)
    }
    // four quarter-sized corner boxes — aggregating across corners
    // keeps the comparison robust to repartitionByRange's SAMPLED
    // boundaries (the range-partitioner seed varies per session, so
    // any single box's hit count can jitter by ±1 and tie)
    val (pQ, sQ) = ((pMx - pMn) / 4, (sMx - sMn) / 4)
    val boxes = Seq(
      (pMn, pMn + pQ, sMn, sMn + sQ), (pMn, pMn + pQ, sMx - sQ, sMx),
      (pMx - pQ, pMx, sMn, sMn + sQ), (pMx - pQ, pMx, sMx - sQ, sMx))
    def hits(fb: Array[(Long, Long, Long, Long)]): Int = boxes.map { case (plo, phi, slo, shi) =>
      fb.count { case (pmn, pmx, smn, smx) =>
        pmn <= phi && plo <= pmx && smn <= shi && slo <= smx }
    }.sum
    val (zBoxes, zAll) = fileBoxes(s"$tmp/z")
    val (lBoxes, lAll) = fileBoxes(s"$tmp/lin")
    assert(zAll >= 8 && lAll >= 8, s"want real file counts, got $zAll/$lAll")
    // 1-D layout: every file spans all of suppkey, so ~1/4 of files
    // intersect each corner box (~16 total over 4 corners). Z-order:
    // only files whose 2-D box overlaps (~1/16 each, ~4 total).
    val (zHit, lHit) = (hits(zBoxes), hits(lBoxes))
    assert(zHit < lHit, s"zorder hit $zHit, linear hit $lHit over 4 corner boxes")
    val (pHi, sHi) = (pMn + pQ, sMn + sQ)
    // and the s14 query over the layout still returns the right data
    val n = spark.read.parquet(s"$tmp/z")
      .filter(col("l_partkey") <= pHi && col("l_suppkey") <= sHi).count()
    val exact = t.filter(col("l_partkey") <= pHi && col("l_suppkey") <= sHi).count()
    assert(n == exact)
  }
}
