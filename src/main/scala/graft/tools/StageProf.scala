package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway per-stage profiler for scale investigations (not part of
  * the library surface): runs named queries and prints, per completed
  * stage, wall time, task-time sum, record/byte volumes for input,
  * shuffle read and shuffle write, plus memory/disk spill — the
  * evidence that tells WHICH exchange or scan dominates an expensive
  * entry before optimizing it.
  *
  * Usage: runMain graft.tools.StageProf <dir> <name[,name...]>
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq("reco_item_item"))
    val spark = graft.core.GraftSession.local("graft-stageprof")
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        val wall = (for {
          c <- si.completionTime; s <- si.submissionTime
        } yield c - s).getOrElse(-1L)
        println(f"[stage ${si.stageId}%4d] wall=${wall / 1000.0}%8.1fs " +
          f"taskTime=${m.executorRunTime / 1000.0}%9.1fs tasks=${si.numTasks}%4d " +
          f"in=${m.inputMetrics.recordsRead}%12d rec/${m.inputMetrics.bytesRead / 1e6}%9.0fMB " +
          f"sr=${m.shuffleReadMetrics.recordsRead}%12d rec/${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.0fMB " +
          f"sw=${m.shuffleWriteMetrics.recordsWritten}%12d rec/${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.0fMB " +
          f"spillMem=${m.memoryBytesSpilled / 1e6}%8.0fMB spillDisk=${m.diskBytesSpilled / 1e6}%8.0fMB  " +
          si.name.takeWhile(_ != '\n').take(60))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // GRAFT_PROF_WARM=1: execute each query once untimed first (cache
    // and JIT warm, like Bench's steady-state minima), so the printed
    // stages attribute the WARM run — the number the bench reports —
    // instead of first-build cost.
    val warm = sys.env.get("GRAFT_PROF_WARM").contains("1")
    names.foreach { n =>
      println(s"=== $n @ $dir ===")
      if (warm) {
        graft.SparkEntry.queries(n)(spark, dir).count()
        Thread.sleep(500)
        println(s"--- warm runs below ---")
      }
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // let straggler stage-completed events drain before the footer
      Thread.sleep(1000)
      println(f"[prof] $n rows=$c wall=$dt%.1fs")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    graft.core.GraftSession.dropScratch(spark)
    spark.stop()
  }
}
