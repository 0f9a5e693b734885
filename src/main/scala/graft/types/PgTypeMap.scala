package graft.types

import org.apache.spark.sql.types._

/** PostgreSQL `udt_name` → Spark DataType map, mirroring the typed decode
  * dispatch in the reference (`src/xmin/writer.rs:441-573`): scalar types,
  * the `_`-prefixed array variants (`writer.rs:508-564`), and the
  * text fallback for unknowns (`writer.rs:565-569`).
  */
object PgTypeMap {

  private val scalar: Map[String, DataType] = Map(
    "int2"        -> ShortType,
    "int4"        -> IntegerType,
    "int8"        -> LongType,
    "text"        -> StringType,
    "varchar"     -> StringType,
    "bpchar"      -> StringType,
    "char"        -> StringType,
    "name"        -> StringType,
    "citext"      -> StringType,
    "bool"        -> BooleanType,
    "float4"      -> FloatType,
    "float8"      -> DoubleType,
    "uuid"        -> StringType,
    "timestamp"   -> TimestampNTZType,
    "timestamptz" -> TimestampType,
    "date"        -> DateType,
    "json"        -> StringType,
    "jsonb"       -> StringType,
    "bytea"       -> BinaryType,
    "numeric"     -> DecimalType(38, 18)
  )

  /** Spark type for a PG udt_name; `_`-prefix = array-of
    * (`writer.rs:508-564`); unknown → StringType (`writer.rs:565-569`). */
  def sparkType(udtName: String): DataType =
    if (udtName.startsWith("_"))
      ArrayType(scalar.getOrElse(udtName.drop(1), StringType))
    else scalar.getOrElse(udtName, StringType)

  /** StructType from (column_name, udt_name) pairs — the reference's
    * in-memory schema shape (`src/xmin/writer.rs:384-408`). */
  def structType(columns: Seq[(String, String)]): StructType =
    StructType(columns.map { case (n, u) => StructField(n, sparkType(u)) })
}
