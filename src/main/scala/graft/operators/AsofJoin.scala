package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, append the payload
  * of the most recent right row with the same key and time <= the left
  * row's time (null when none exists).
  *
  * Spark has no built-in as-of join; the naive encoding — an equi-join
  * on key plus a range predicate, then a per-left-row argmax — builds
  * an |left| × |right-per-key| intermediate before pruning it, which
  * detonates on active keys at warehouse scale. This implementation is
  * the union/carry-forward formulation instead: tag both sides, union,
  * and run one `last(payload, ignoreNulls)` window per payload column
  * ordered by (time, tag). Cost is a single hash shuffle on the key
  * plus an in-partition sort — the same shape as any windowed
  * aggregation, with no row multiplication at any point. Right rows
  * sort before left rows at equal times, so the match is inclusive
  * (right.time == left.time matches), exactly DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t` semantics.
  *
  * Contract: `right` must be unique per (key, time) — pre-aggregate
  * if necessary (as-of semantics are otherwise ambiguous; DuckDB
  * imposes the same requirement). Payload column names must not
  * collide with left columns. Time columns must share one orderable
  * type on both sides (convert timestamps to epoch micros first when
  * the representations differ).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, leftKey: String, leftTime: String,
               right: DataFrame, rightKey: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${payload.mkString(",")} collide with left columns")
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
    val r = right.select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_tag")) ++
        payload.map(col)): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1)
      .select((lCols ++ payload).map(col): _*)
  }
}
