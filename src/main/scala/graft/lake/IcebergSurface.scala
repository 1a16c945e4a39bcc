package graft.lake

/** The Iceberg-shaped CONFIG surface of the lake facade — the swap-in
  * contract for the day a real `iceberg-spark-runtime` is on the
  * classpath (this sandbox cannot load one: zero egress, jar absent —
  * see [[Lake]]'s scaladoc).
  *
  * The reference provisions tables from a declarative request of
  * `(column, transform)` partition specs plus a property map
  * (`MatanoIcebergTableCustomResource.kt:42-53` — `MatanoPartitionSpec`,
  * `MatanoTableRequest`; transforms resolved at
  * `MatanoIcebergTableCustomResource.kt:103-142`). This object keeps the
  * facade's layout knobs expressed in EXACTLY those terms — `hours(ts)`,
  * `bucket(n, col)`, `truncate(w, col)` — so swapping the physical layer
  * for a real catalog is a `CREATE TABLE … USING iceberg PARTITIONED BY
  * (<rendered transforms>) TBLPROPERTIES (<rendered properties>)` away,
  * with no change to the operators above. IcebergSurfaceSpec gates the
  * rendering; no runtime behavior is claimed here.
  */
object IcebergSurface {

  /** One partition field: Iceberg transform grammar (the subset the
    * reference's request schema accepts plus `truncate`, which the
    * layout tools use for prefix clustering).
    */
  sealed trait Transform { def render: String }
  final case class Identity(column: String) extends Transform {
    def render: String = column
  }
  final case class Hour(column: String) extends Transform {
    def render: String = s"hours($column)"
  }
  final case class Day(column: String) extends Transform {
    def render: String = s"days($column)"
  }
  final case class Month(column: String) extends Transform {
    def render: String = s"months($column)"
  }
  final case class Bucket(n: Int, column: String) extends Transform {
    require(n > 0, s"bucket count must be positive, got $n")
    def render: String = s"bucket($n, $column)"
  }
  final case class Truncate(width: Int, column: String) extends Transform {
    require(width > 0, s"truncate width must be positive, got $width")
    def render: String = s"truncate($width, $column)"
  }

  /** Parse the `(column, transform)` request form. The reference's
    * resolver (`MatanoPartitionSpec`) accepts only `identity` / `hour` /
    * `bucket[n]`; `day` / `month` / `truncate[w]` are LOCAL extensions
    * covering the rest of Iceberg's transform grammar (useful for
    * coarser-grained lakes; a config written for the reference never
    * produces them). Unknown transforms throw with the construct named,
    * as the reference's resolver does.
    */
  def transformOf(column: String, transform: String): Transform = {
    val bucketRe = raw"bucket\[(\d+)\]".r
    val truncRe = raw"truncate\[(\d+)\]".r
    transform match {
      case "identity" => Identity(column)
      case "hour" => Hour(column)
      case "day" => Day(column)
      case "month" => Month(column)
      case bucketRe(n) => Bucket(n.toInt, column)
      case truncRe(w) => Truncate(w.toInt, column)
      case other => sys.error(s"unsupported iceberg partition transform '$other'")
    }
  }

  /** Default table properties, matching the reference's lake posture:
    * Iceberg v2 row-level semantics (the MERGE/overwrite surface the
    * facade implements) and zstd parquet at rest
    * (`lib/rust/lake_writer/src/common.rs:52`; GraftSession sets the
    * same codec for the facade's files).
    */
  val defaultProperties: Map[String, String] = Map(
    "format-version" -> "2",
    "write.parquet.compression-codec" -> "zstd",
    "write.distribution-mode" -> "hash")

  final case class TableSpec(
      name: String,
      partitions: Seq[Transform],
      properties: Map[String, String] = defaultProperties,
      sortOrder: Seq[String] = Nil) {
    /** `PARTITIONED BY (…)` clause body. */
    def partitionedBy: String = partitions.map(_.render).mkString(", ")
    /** `TBLPROPERTIES (…)` clause body, key-sorted for determinism. */
    def tblProperties: String = properties.toSeq.sorted
      .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    /** The full swap-in DDL. */
    def createDdl: String = {
      val part =
        if (partitions.isEmpty) "" else s" PARTITIONED BY ($partitionedBy)"
      s"CREATE TABLE $name USING iceberg$part TBLPROPERTIES ($tblProperties)"
    }
  }

  /** The facade's standard log-source table: hour-partitioned on event
    * time — [[Lake.withHourPartition]]'s `%Y-%m-%d-%H` directory value
    * is the materialization of `hours(ts)` (same hour granularity, UTC).
    */
  def logSourceTable(name: String, tsCol: String = "ts"): TableSpec =
    TableSpec(name, Seq(Hour(tsCol)))

  /** A bucket-clustered table ([[Lake.writeBucketed]]'s layout — the
    * q131 zero-exchange join class; `bucket(n, col)` is the Iceberg
    * spelling of the same hash clustering).
    */
  def bucketedTable(name: String, n: Int, col: String,
      tsCol: Option[String] = None): TableSpec =
    TableSpec(name, tsCol.map(Hour(_)).toSeq :+ Bucket(n, col))
}
