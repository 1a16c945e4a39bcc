package graft

import org.apache.spark.sql.SparkSession
import scala.util.chaining._

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the dev harness (`local[32]`, single JVM) but every knob is the
  * one you'd set on a real cluster too: AQE for runtime re-planning (skew
  * joins, partition coalescing), zstd parquet at rest (reference lake files
  * are ZSTD parquet — /root/reference lib/rust/lake_writer/src/common.rs:52),
  * UTC session time zone for deterministic timestamp semantics.
  */
object GraftSession {

  /** Apply graft's standard config to a builder. `shufflePartitions` should
    * match available parallelism locally; on a real cluster leave AQE to
    * coalesce from a higher initial number.
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffledHashJoinFactor", "3")
      // Manifest-listed lake reads hand the reader an explicit path list;
      // above this threshold Spark launches a one-task-PER-PATH listing
      // job before planning (spark default: 32 paths). On local/HDFS-fast
      // filesystems a sub-4096 path stat loop is microseconds of driver
      // work, while the parallel job costs pure task dispatch (measured:
      // q81's 721-file table paid a 721-task listing job ≈ 1-1.4 s wall,
      // 60% of the query). On an object-store deployment where per-path
      // stats are slow RPCs, override back down via GRAFT_CONF /
      // spark-submit conf — the knob moves WHERE listing happens, never
      // what is read.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      // dev knob: GRAFT_CONF="k=v;k2=v2" overlays arbitrary SQL confs —
      // used to A/B runtime hypotheses (codegen on/off, AQE variants)
      // without code churn; unset in driver runs
      .tap { bb =>
        sys.env.get("GRAFT_CONF").foreach(_.split(";").foreach { kv =>
          kv.split("=", 2) match {
            // trim BEFORE the guard so " =v" can't slip an empty key
            // through; log each applied override so a non-default session
            // is visible in driver output rather than silently different
            case Array(k, v) if k.trim.nonEmpty =>
              System.err.println(s"[graft] GRAFT_CONF override: ${k.trim}=${v.trim}")
              bb.config(k.trim, v.trim)
            case _ => ()
          }
        })
      }

  /** Local session for tests/tools. */
  def local(cores: Int = 32): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    registerFunctions(s)
    s
  }

  /** Register graft's native expressions for spark.sql callers — the same
    * set `spark.sql.extensions=graft.GraftExtensions` injects.
    */
  def registerFunctions(s: SparkSession): Unit =
    GraftExtensions.functions.foreach { case (id, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(s, id.funcName, builder)
    }
}
