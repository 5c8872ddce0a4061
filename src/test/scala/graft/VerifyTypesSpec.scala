package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the comparator-type contract guard (Verify.unstableColumns).
  * The driver's hash compare materializes Spark parquet and DuckDB
  * results through different pandas paths; wide decimals and float32
  * are value-equal but dtype-different there (round-13 `w14_trend`
  * regression). The guard must flag exactly that class and nothing
  * in the stable set. Also sweeps every SparkEntry query's OUTPUT
  * schema at sf0.001 so a regression is caught at authoring time,
  * not by the driver round. */
class VerifyTypesSpec extends SparkSpec {

  test("stable types pass the guard") {
    val s = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("d", DoubleType),
      StructField("s", StringType), StructField("dt", DateType),
      StructField("ts", TimestampType), StructField("bin", BinaryType),
      StructField("dec18", DecimalType(18, 4)),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, DoubleType)),
      StructField("st", StructType(Seq(StructField("x", DoubleType))))))
    assert(Verify.unstableColumns(s).isEmpty)
  }

  test("wide decimals and float32 are flagged, including nested") {
    val s = StructType(Seq(
      StructField("ok", LongType),
      StructField("slope_num", DecimalType(38, 0)),
      StructField("f", FloatType),
      StructField("arr", ArrayType(FloatType)),
      StructField("st", StructType(Seq(StructField("w", DecimalType(19, 0)))))))
    val flagged = Verify.unstableColumns(s).map(_.takeWhile(_ != ':'))
    assert(flagged == Seq("slope_num", "f", "arr", "st"))
    assert(Verify.unstableColumns(s).exists(_.contains("DECIMAL(38,0)")))
  }

  test("every SparkEntry query emits only comparator-stable output types") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // schema only — no execution; analysis is cheap at any scale
        val bad = Verify.unstableColumns(fn(spark, dir).schema)
        if (bad.nonEmpty) Some(s"$name -> ${bad.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      s"comparator-unstable outputs:\n${offenders.mkString("\n")}")
  }
}
