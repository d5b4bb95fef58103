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

  /** Build a local session for tests/benchmarks. Production would go
    * through spark-submit with the same confs minus master.
    */
  def session(master: String = "local[32]", shufflePartitions: Int = 32,
              appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      // native catalyst functions (fvec_dot) via the public extensions
      // API — spark-submit deployments set
      // spark.sql.extensions=graft.functions.GraftExtensions instead
      .withExtensions(graft.functions.VecOps.register)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the driver-generated TPC-H-ish tables. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
