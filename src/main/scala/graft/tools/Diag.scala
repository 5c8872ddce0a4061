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
      // which pair path the item-item kernel took, with the CAUSE
      // split (round-16 advice: the boolean alone stopped
      // distinguishing AQE-skew-guard refusal from routine emit
      // widening once widening engages on every corpus past ~sf10):
      // guardRefused = locality proof failed on the executed plan;
      // widened = pair volume demanded a wider emit side. Either one
      // means the explicit user exchange was paid.
      if (n == "reco_item_item")
        println(s"[diag] reco_item_item pairSrcRepartitioned = " +
          s"${graft.ml.ItemItem.lastPairSrcRepartitioned} " +
          s"(guardRefused, widened) = " +
          s"${graft.ml.ItemItem.lastPairExchangeCause}")
    }
    graft.core.GraftSession.dropScratch(spark)
    spark.stop()
  }
}
