package graft

/** Pins the SCD2 incremental merge (etl_scd2_merge) against the full
  * rebuild (etl_scd2) on a fixture where every boundary case occurs:
  *
  *  - cust 1: delta's FIRST row has the same priority as the stored
  *    current version — the collapse rule must hold across the seam
  *    (no new version), while a later delta row opens one and closes
  *    the stored current row;
  *  - cust 2: untouched by the delta — history must pass through;
  *  - cust 3: appears ONLY in the delta — versions start at 1, with
  *    an in-delta collapse.
  *
  * The fixture's max order date (1995-12-31) puts the 180-day cutoff
  * at 1995-07-04, so dates <= that are "stored history". */
class Scd2MergeSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scd2m_" +
      java.util.UUID.randomUUID().toString.take(8)
    import spark.implicits._
    Seq(
      // cust 1: base A,A(collapse),B ; delta B(seam collapse),C
      (1L, "1995-01-01", 101L, "A"),
      (1L, "1995-02-01", 102L, "A"),
      (1L, "1995-03-01", 103L, "B"),
      (1L, "1995-08-01", 104L, "B"),
      (1L, "1995-09-01", 105L, "C"),
      // cust 2: base only
      (2L, "1995-01-15", 201L, "D"),
      // cust 3: delta only, E,E(collapse),F
      (3L, "1995-10-01", 301L, "E"),
      (3L, "1995-11-01", 302L, "E"),
      (3L, "1995-12-31", 303L, "F")
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders_out")
    val p = java.nio.file.Paths.get(dir)
    val part = java.nio.file.Files.list(p.resolve("orders_out"))
      .filter(f => f.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.move(part, p.resolve("orders.parquet"))
    dir
  }

  private def rows(name: String) =
    graft.queries.ScaleOps.queries(name)(spark, fixtureDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        String.valueOf(r.getDate(3)), String.valueOf(r.getDate(4)),
        r.getBoolean(5)))
      .toSet

  test("merge reproduces the rebuild, including all seam cases") {
    val expected = Set(
      (1L, 1, "A", "1995-01-01", "1995-03-01", false),
      (1L, 2, "B", "1995-03-01", "1995-09-01", false),
      (1L, 3, "C", "1995-09-01", "null", true),
      (2L, 1, "D", "1995-01-15", "null", true),
      (3L, 1, "E", "1995-10-01", "1995-12-31", false),
      (3L, 2, "F", "1995-12-31", "null", true))
    assert(rows("etl_scd2") == expected)
    assert(rows("etl_scd2_merge") == expected)
  }
}
