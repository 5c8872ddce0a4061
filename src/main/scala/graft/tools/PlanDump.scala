package graft.tools

/** Print the formatted physical plan of named queries against a data
  * dir WITHOUT executing them — the `.explain("formatted")` loop the
  * build process runs after every operator lands ("iterate until it's
  * the plan you'd want"), packaged so plan inspection at any scale
  * (sf10's statistics differ from sf0.01's!) is one command:
  *
  *   runMain graft.tools.PlanDump <sfDir> <name>[,<name>...]
  *
  * Planning consults file-level statistics only (no jobs run), so this
  * is seconds even where execution is minutes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q1_agg"))
    val spark = graft.core.GraftSession.local("graft-plandump")
    names.foreach { n =>
      println(s"\n===== $n @ $dir =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    graft.core.GraftSession.dropScratch(spark)
    spark.stop()
  }
}
