package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostics for scale investigations (not part of the
  * library surface): prints output row counts of the pair-emitting
  * headline entries, the evidence that separates "quadratic plan"
  * from "quadratic RESULT" when a second-decade α reads ≥1. */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("j7_band_join", "dd_cosine_pairs"))
    val spark = graft.core.GraftSession.local("graft-diag")
    names.foreach { n =>
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      println(s"[diag] $n @ $dir rows = $c")
      // which pair path the item-item kernel took (the AQE-skew guard
      // evidence): false = locality proven, no safety exchange;
      // true = guard refused the executed plan, explicit exchange paid
      if (n == "reco_item_item")
        println(s"[diag] reco_item_item pairSrcRepartitioned = " +
          s"${graft.ml.ItemItem.lastPairSrcRepartitioned}")
    }
    graft.core.GraftSession.dropScratch(spark)
    spark.stop()
  }
}
