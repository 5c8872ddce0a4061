package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Local-mode defaults are tuned for the test harness (local[32],
  * 32 shuffle partitions); on a real cluster the same builder is used
  * with `master` unset (taken from spark-submit) and shuffle
  * partitions sized to ~2-3x total executor cores. AQE is enabled so
  * the physical plan re-sizes partitions / rewrites skewed joins at
  * runtime — the knob that matters most at 100 TB.
  */
object GraftSession {
  def builder(appName: String = "graft", cpus: String = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // native codegen'd vector expressions (vec_dot / vec_cosine)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // harness events.parquet carries TIMESTAMP(NANOS); read as Long ns
      // and convert in Tables (exact — data is µs-granular).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Local session used by mains and tests. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = defaultCpus
    val s = builder(appName, cpus).master(s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Scratch path for a query's side-effect output, unique per
    * (operator, data dir, SPARK APPLICATION): two processes running
    * the same query against the same data dir (e.g. Verify and Bench
    * concurrently) must never overwrite each other's layout mid-read.
    * toUnsignedString instead of .abs — Int.MinValue.abs is negative. */
  def scratchDir(spark: SparkSession, tag: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      s"${spark.sparkContext.applicationId}_" +
      java.lang.Integer.toUnsignedString(dir.hashCode)

  /** Scratch TABLE name, unique the same way (catalog names share the
    * derby metastore across sessions in one JVM but not across
    * processes writing to the same warehouse dir). */
  def scratchTable(spark: SparkSession, tag: String, dir: String): String =
    s"g_${tag}_" +
      s"${spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")}_" +
      java.lang.Integer.toUnsignedString(dir.hashCode)
}
