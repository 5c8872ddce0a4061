package graft.tools

/** Print the formatted physical plan of named queries against a data
  * dir — the `.explain("formatted")` loop the build process runs after
  * every operator lands ("iterate until it's the plan you'd want"),
  * packaged so plan inspection at any scale (sf10's statistics differ
  * from sf0.01's!) is one command:
  *
  *   runMain graft.tools.PlanDump <sfDir> <name>[,<name>...]
  *
  * Planning itself consults file-level statistics only, BUT a few
  * query CONSTRUCTORS run real jobs or side effects before returning
  * their DataFrame (etl_backfill/etl_pipeline stage and read back a
  * whole scratch pipeline; reco_item_item probes the part table's
  * metadata count for its broadcast gate — memoized, so once per
  * JVM+dir). For those names a plan dump is NOT side-effect-free at
  * scale; they are listed in `constructionSideEffects` and the dump
  * prints a warning first. Everything else plans in seconds even
  * where execution is minutes.
  */
object PlanDump {
  /** Names whose (SparkSession, dir) => DataFrame constructor executes
    * jobs or writes scratch BEFORE the plan exists — dumping their
    * plan at sf10 runs that work for real. Kept in sync with
    * Bench.coldExplicit plus the gate-probing reco entries. */
  val constructionSideEffects: Set[String] = Set(
    "etl_backfill", "etl_pipeline", "etl_wap", "etl_scd2",
    "etl_scd2_merge", "llm_corpus_build", "llm_corpus_audit",
    "st_corpus_ingest", "s13_compact", "s23_deletion_vectors",
    "reco_item_item")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q1_agg"))
    val spark = graft.core.GraftSession.local("graft-plandump")
    names.foreach { n =>
      println(s"\n===== $n @ $dir =====")
      if (constructionSideEffects.contains(n))
        println(s"[plandump] WARNING: $n's constructor runs jobs/side " +
          "effects at DataFrame-build time — this dump executes real " +
          "work at this scale, not just planning.")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    graft.core.GraftSession.dropScratch(spark)
    spark.stop()
  }
}
