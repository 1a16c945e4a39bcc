package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment-table lookup joins.
  *
  * The reference resolves `get_enrichment_table_record(table, {key: value})`
  * with an mmap'd Avro file + per-key offset index (reference
  * lib/rust/shared/src/functions.rs:108-255, avro_index.rs:30-156). In Spark
  * the idiomatic equivalent is a broadcast hash join: the enrichment table is
  * small by construction, so the lookup side ships to every executor once and
  * the probe is a hash-map hit inside whole-stage codegen — same point-lookup
  * cost, no custom index machinery, and it scales to any event volume because
  * the big side never shuffles.
  */
object Enrichment {

  /** Left-join `events` against a small `enrichment` table on equality of
    * `eventKey == lookupKey`, exposing the matched record as one struct
    * column `as` (null when no match) — the shape VRL's
    * get_enrichment_table_record returns.
    */
  def lookupJoin(
      events: DataFrame,
      enrichment: DataFrame,
      eventKey: Column,
      lookupKey: String,
      as: String): DataFrame = {
    val packed = enrichment
      .select(col(lookupKey).as("__graft_lookup_key"),
        struct(enrichment.columns.map(col).toIndexedSeq: _*).as(as))
    events.join(broadcast(packed), eventKey === col("__graft_lookup_key"), "left")
      .drop("__graft_lookup_key")
  }

  /** Flat variant: append selected enrichment columns (optionally prefixed)
    * instead of a struct. Columns absent on miss are null, as in the
    * reference's left-lookup semantics.
    */
  def lookupJoinFlat(
      events: DataFrame,
      enrichment: DataFrame,
      eventKey: Column,
      lookupKey: String,
      prefix: String = ""): DataFrame = {
    val renamed = enrichment.columns.foldLeft(enrichment) { (d, c) =>
      d.withColumnRenamed(c, prefix + c)
    }
    events.join(broadcast(renamed), eventKey === col(prefix + lookupKey), "left")
  }

  /** Point-lookup form for imperative consumers (the reference's
    * detection-side `get_enrichment_table_record`): collect the small
    * table once into a broadcast map keyed by `lookupKey`. Use inside
    * rules/foreachBatch bodies; plan-level joins should use lookupJoin.
    */
  def lookupMap(enrichment: DataFrame, lookupKey: String)
      : org.apache.spark.broadcast.Broadcast[Map[String, org.apache.spark.sql.Row]] = {
    val keyed = enrichment.collect()
      .map(r => String.valueOf(r.getAs[Any](lookupKey)) -> r).toMap
    enrichment.sparkSession.sparkContext.broadcast(keyed)
  }

  /** MERGE upsert for enrichment tables with a primary key (reference J2,
    * Enrichment.kt:305-324: `MERGE INTO main USING temp ON pk WHEN MATCHED
    * UPDATE WHEN NOT MATCHED INSERT`). Without an Iceberg catalog this is
    * the equivalent dataframe form: updates win on key collision, existing
    * rows otherwise retained. Schemas must match.
    */
  def mergeUpsert(existing: DataFrame, updates: DataFrame, pk: String): DataFrame = {
    val retained = existing.join(updates.select(col(pk)), Seq(pk), "left_anti")
    retained.unionByName(updates)
  }
}
