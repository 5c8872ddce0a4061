package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Narrow bridge to the `private[sql]` InternalRow-level RDD entry and
  * exit points. Purpose: primitive-typed mapPartitions kernels. The
  * public route (`Dataset[Long].mapPartitions`) BOXES every element
  * through a Scala Iterator[Long] — at 10⁹ rows per partition sweep
  * that boxing (plus the encoder round-trip) costs more than the
  * kernel's actual work. Reading `getLong(i)` off the InternalRow
  * iterator and emitting UnsafeRows keeps the whole pass
  * allocation-free. Same auditability contract as ColumnBridge: this
  * file is the single sanctioned crossing point for row-level access.
  */
object RowBridge {
  /** The query's InternalRow RDD (post-planning, UnsafeRow-backed). */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Wrap an InternalRow RDD back into a DataFrame. Rows must match
    * `schema` physically (emit via UnsafeProjection + copy). */
  def ofInternalRows(spark: SparkSession, rdd: RDD[InternalRow],
                     schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
