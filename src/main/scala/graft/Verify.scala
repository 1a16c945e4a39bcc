package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (GRAFT_VERIFY_ONLY=q103,q104): iterate on new
    // queries without paying the full sweep. Unset for driver runs.
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) =>
        names.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // A failed query must be VISIBLE in the artifacts, not just stderr: the
    // driver drops queries with no output dir from CORRECTNESS_r{N}.json, so
    // a regression would otherwise read as a silently smaller all-green set
    // (round 10 lost 3 queries this way). _errors.json makes it explicit.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally spark.catalog.clearCache() // even a FAILED query's persists must not leak
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = only match {
      case Some(names) => SparkEntry.oracleSql.filter { case (n, _) =>
        names.exists(n.startsWith) }
      case None => SparkEntry.oracleSql
    }
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    // Manifest of the FULL registry: tools/OracleBench.py hard-fails when
    // the oracle file it was handed doesn't cover every registered oracle
    // (a stale verify dir once silently shrank a judge's gate set by 3
    // queries). `subset: true` marks dev GRAFT_VERIFY_ONLY dumps so they
    // can never masquerade as a gate-grade oracle set.
    def arr(names: Iterable[String]): String =
      names.map(q).mkString("[", ",", "]")
    val manifest =
      s"""{"queries": ${arr(SparkEntry.queries.keys)},
         | "oracles": ${arr(SparkEntry.oracleSql.keys)},
         | "subset": ${only.nonEmpty}}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/query_manifest.json"), manifest)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
