package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Explicitly-constructed runtime bloom filters.
  *
  * Spark's own `InjectRuntimeFilter` rule produces exactly this shape —
  * a `BloomFilterAggregate` over `xxhash64(key)` on the creation side,
  * wrapped in a scalar subquery and probed with
  * `BloomFilterMightContain` on the application side — but the rule
  * only fires when the application-side key is a plain scan column. A
  * key that is *derived* (e.g. `explode(shingles)`) can never receive
  * an injected filter, so for those plans the engine builds the same
  * expression tree by hand. The semantics are identical: the bloom has
  * no false negatives, so fronting an equi-join with the probe never
  * changes the join's result — it only prunes probe-side rows BEFORE
  * their shuffle, which at 100 TB is the difference between shuffling
  * the whole derived key stream and shuffling only the
  * probably-matching slice.
  *
  * Scale shape: the build is a distributed aggregate (map-side partial
  * blooms OR-merged at the single reducer), the finished bloom is a
  * bounded sketch (numBits/8 bytes, ≤8 MB at the default cap) shipped
  * to executors through the scalar-subquery mechanism — the same path
  * an injected runtime filter uses. Nothing here depends on local mode.
  */
object BloomFilterSupport {

  /** Predicate column `might_contain(bloom(build[buildKey]), xxhash64(probeKey))`.
    *
    * @param build         creation-side rows (should already be slim /
    *                      distinct — the aggregate walks every row)
    * @param buildKey      key column name on the build side
    * @param probeKey      key expression on the probe side (any type
    *                      xxhash64 accepts)
    * @param expectedItems sizing hint for the bloom (items, not bits);
    *                      an undersized bloom only raises the
    *                      false-positive rate, never drops a match
    */
  def mightContainProbe(build: DataFrame, buildKey: String,
                        probeKey: Column, expectedItems: Long): Column = {
    val buildHash = new XxHash64(Seq(ColumnBridge.expression(build.col(buildKey))))
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(buildHash, expectedItems).toAggregateExpression())
    val bloomPlan = build.select(agg.as("bloom")).queryExecution.analyzed
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(ColumnBridge.expression(probeKey)))))
  }
}
