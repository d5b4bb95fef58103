package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by the engine.
  *
  * Design note (scale): every knob here is chosen for a multi-executor
  * cluster reading ~100 TB — AQE on (runtime re-plan, skew-join split,
  * partition coalescing), shuffle partitions sized to the test rig but
  * overridable, broadcast threshold left at Spark's default so small
  * dims (alias dictionaries, region/nation tables) broadcast.
  */
object Graft {

  private def configured(b: org.apache.spark.sql.SparkSession.Builder,
                         appName: String): SparkSession = {
    val spark = b
      .appName(appName)
      // native catalyst functions (fvec_dot) via the public extensions
      // API — spark-submit deployments set
      // spark.sql.extensions=graft.functions.GraftExtensions instead
      .withExtensions(graft.functions.VecOps.register)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Build a local session for tests/benchmarks. Production goes through
    * [[submitSession]], which takes master and sizing from the submit
    * conf instead of code.
    */
  def session(master: String = "local[32]", shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession =
    configured(SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false"), appName)

  /** Session for spark-submit deployments: NO `.master()` call — a
    * hard-coded master overrides `--master yarn/k8s` and would silently
    * run the 100 TB job single-node on the driver. Cluster sizing
    * (`spark.master`, `spark.sql.shuffle.partitions`, executor counts)
    * belongs to the submit conf.
    */
  def submitSession(appName: String): SparkSession =
    configured(SparkSession.builder(), appName)

  /** Read one of the driver-generated TPC-H-ish tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Query scratch space, deleted recursively at JVM exit — the
    * graph-replay and streaming queries need throwaway table roots /
    * checkpoint dirs that must OUTLIVE the returned (lazy) DataFrame
    * but not the process. One shutdown hook total; dirs register into
    * it (a hook per dir would pile up threads across a 139-query run).
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchLock.synchronized {
      if (scratchDirs.isEmpty)
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          scratchDirs.foreach(d =>
            try graft.snapshot.SnapshotTable.deleteTree(d)
            catch { case _: Exception => () })))
      scratchDirs += p
    }
    p.toString
  }
  private val scratchLock = new Object
  private val scratchDirs =
    scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
}
