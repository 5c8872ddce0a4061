package graft
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("prof")
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.1").documents
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val sh = graft.operators.Dedup.withShingles(docs)
    time("shingles")(sh.count())
    val sg = graft.operators.Dedup.minhashSignatures(sh)
    time("signatures")(sg.count())
    time("pairs_full")(graft.operators.Dedup.minhashLshPairs(docs).count())
    time("chargram_full")(graft.operators.Dedup.charGramPairs(docs).count())
    spark.stop()
  }
}
