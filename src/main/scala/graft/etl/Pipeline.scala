package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** Batch pipeline runner — the Spark analog of the reference's Airflow
  * DAG (dags/e_commerce_dw_dag.py): staged dataflow with per-stage
  * error isolation (extract_data.py:86-90 continues past a failed
  * table and reports at the end).
  *
  * Spark subsumes the DAG's intra-stage parallelism: the six dimension
  * builds are independent lazy plans and the scheduler overlaps their
  * stages; a failure in one stage is caught and recorded without
  * aborting the rest. Writes are atomic per-table overwrites (the
  * reference's `if_exists='replace'` full-rebuild semantics).
  */
object Pipeline {
  final case class StageResult(name: String, rows: Long, ok: Boolean, error: Option[String])

  def stages(t: Tables): Seq[(String, () => DataFrame)] = Seq(
    "dim_customer" -> (() => Warehouse.dimCustomer(t)),
    "dim_supplier" -> (() => Warehouse.dimSupplier(t)),
    "dim_part"     -> (() => Warehouse.dimPart(t)),
    "dim_geo"      -> (() => Warehouse.dimGeo(t)),
    "dim_dates"    -> (() => Warehouse.dimDates(t)),
    "fact_orders"  -> (() => Warehouse.factOrders(t)))

  /** Full warehouse rebuild: sfDir parquet → outDir parquet star schema. */
  def run(spark: SparkSession, sfDir: String, outDir: String): Seq[StageResult] = {
    val t = Tables(spark, sfDir)
    stages(t).map { case (name, build) =>
      try {
        val df = build()
        df.write.mode("overwrite").parquet(s"$outDir/$name")
        val n = spark.read.parquet(s"$outDir/$name").count()
        StageResult(name, n, ok = true, None)
      } catch {
        case e: Throwable => StageResult(name, -1, ok = false, Some(e.getMessage))
      }
    }
  }

  /** Register the warehouse as temp views so `spark.sql` works against
    * it (the reference's ad-hoc analytics surface, postgres_reader.py). */
  def registerWarehouse(spark: SparkSession, outDir: String): Unit =
    stages(Tables(spark, outDir)).map(_._1).foreach { name =>
      spark.read.parquet(s"$outDir/$name").createOrReplaceTempView(name)
    }
}
