package graft.schema

import org.apache.spark.sql.types._

/** Declarative schema composition — the reference's `resolveSchema`
  * (infra/lib/schema.ts:144-182) and `mergeSchema` (schema.ts:44-70):
  * tables cherry-pick subtrees of a master (ECS-style) schema by dotted
  * field name, merge user-defined custom fields recursively with conflict
  * errors, always get the default `ts`/`labels`/`tags` fields, and keep
  * `ts` first (log-source.ts:458).
  */
object SchemaRegistry {

  final case class SchemaConflict(path: String, a: DataType, b: DataType)
    extends RuntimeException(s"schema conflict at $path: $a vs $b")

  /** Default fields every table carries (schema.ts:94-95). */
  val defaults: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = true),
    StructField("labels", ArrayType(StringType), nullable = true),
    StructField("tags", ArrayType(StringType), nullable = true)))

  /** Cherry-pick dotted subtrees (`ecs_field_names` semantics): keep only
    * the selected roots/subpaths of `master`.
    */
  def cherryPick(master: StructType, fieldNames: Seq[String]): StructType = {
    def pick(st: StructType, paths: Seq[Seq[String]]): StructType = {
      val byRoot = paths.filter(_.nonEmpty).groupBy(_.head)
      StructType(st.fields.flatMap { f =>
        byRoot.get(f.name).map { sub =>
          val rest = sub.map(_.tail).filter(_.nonEmpty)
          f.dataType match {
            case nested: StructType if rest.nonEmpty =>
              f.copy(dataType = pick(nested, rest))
            case _ => f
          }
        }
      })
    }
    pick(master, fieldNames.map(_.split('.').toSeq))
  }

  /** Recursive merge with conflict detection: identical leaf types unify;
    * struct-vs-struct merges fieldwise; anything else at the same path is
    * an error (mergeSchema semantics).
    */
  def merge(a: StructType, b: StructType, path: String = ""): StructType = {
    val aMap = a.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { af =>
      b.fields.find(_.name == af.name) match {
        case Some(bf) =>
          (af.dataType, bf.dataType) match {
            case (x: StructType, y: StructType) =>
              af.copy(dataType = merge(x, y, s"$path${af.name}."))
            case (x, y) if x == y => af
            case (x, y) => throw SchemaConflict(path + af.name, x, y)
          }
        case None => af
      }
    }
    StructType(merged ++ b.fields.filterNot(f => aMap.contains(f.name)))
  }

  /** Full resolution: picked ECS subtrees + custom fields + defaults,
    * `ts` sorted to the front, every field nullable.
    */
  def resolve(master: StructType, ecsFieldNames: Seq[String],
      custom: StructType = new StructType()): StructType = {
    val base = merge(cherryPick(master, ecsFieldNames), custom)
    val withDefaults = merge(base, defaults)
    val nullable = asNullable(withDefaults)
    StructType(
      nullable.fields.filter(_.name == "ts") ++
      nullable.fields.filterNot(_.name == "ts").sortBy(_.name))
  }

  def asNullable(st: StructType): StructType =
    StructType(st.fields.map { f =>
      f.dataType match {
        case s: StructType => f.copy(dataType = asNullable(s), nullable = true)
        case ArrayType(e: StructType, _) =>
          f.copy(dataType = ArrayType(asNullable(e), containsNull = true), nullable = true)
        case ArrayType(e, _) =>
          f.copy(dataType = ArrayType(e, containsNull = true), nullable = true)
        case _ => f.copy(nullable = true)
      }
    })
}
