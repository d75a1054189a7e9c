package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multiset set-difference that tolerates map-typed columns.
  *
  * Spark refuses set operations ("Cannot have map type columns in
  * DataFrame which calls set operations") because maps carry no
  * canonical entry order. The engine's MOR-patch resolution and CDC
  * diff are both built on `exceptAll`, so without this shim a table
  * with ANY map column (at any nesting depth) could commit a patch
  * version its own resolver can never analyze — a bricked head.
  *
  * The shim gives maps the SQL-standard order-insensitive equality:
  * each map is canonicalized to its key-sorted `map_entries` array
  * (keys are unique within a map, so the key alone is a total order),
  * recursively through structs/arrays/nested maps, the difference runs
  * on the canonical frames, and the surviving rows are restored with
  * `map_from_entries`. Cost: two projections around the same
  * shuffle-on-full-row `exceptAll` — no extra shuffle, codegen-friendly
  * collection expressions only. Schemas without maps pass through to
  * plain `exceptAll` untouched.
  */
private[graft] object MapSafeSetOps {

  /** True when a map lurks anywhere in the type tree. */
  def hasMap(dt: DataType): Boolean = dt match {
    case _: MapType       => true
    case ArrayType(et, _) => hasMap(et)
    case s: StructType    => s.fields.exists(f => hasMap(f.dataType))
    case _                => false
  }

  def hasMap(schema: StructType): Boolean = schema.fields.exists(f => hasMap(f.dataType))

  /** The orderable twin of `dt`: every MapType becomes a key-sorted
    * ArrayType(Struct(key, value)). */
  private def canonType(dt: DataType): DataType = dt match {
    case MapType(k, v, vn) =>
      ArrayType(StructType(Seq(
        StructField("key", canonType(k), nullable = false),
        StructField("value", canonType(v), nullable = vn))), containsNull = false)
    case ArrayType(et, n) => ArrayType(canonType(et), n)
    case s: StructType    => StructType(s.fields.map(f => f.copy(dataType = canonType(f.dataType))))
    case other            => other
  }

  private def canon(c: Column, dt: DataType): Column = dt match {
    case MapType(k, v, _) =>
      array_sort(transform(map_entries(c), e =>
        struct(canon(e.getField("key"), k).as("key"), canon(e.getField("value"), v).as("value"))))
    case ArrayType(et, _) if hasMap(et) => transform(c, x => canon(x, et))
    case s: StructType if s.fields.exists(f => hasMap(f.dataType)) =>
      // rebuild field-wise; a NULL struct must stay NULL, not become a
      // struct of NULLs
      val rebuilt = struct(s.fields.map(f => canon(c.getField(f.name), f.dataType).as(f.name)).toSeq: _*)
      when(c.isNull, lit(null).cast(canonType(s))).otherwise(rebuilt)
    case _ => c
  }

  private def uncanon(c: Column, dt: DataType): Column = dt match {
    case MapType(k, v, _) =>
      map_from_entries(transform(c, e =>
        struct(uncanon(e.getField("key"), k).as("key"), uncanon(e.getField("value"), v).as("value"))))
    case ArrayType(et, _) if hasMap(et) => transform(c, x => uncanon(x, et))
    case s: StructType if s.fields.exists(f => hasMap(f.dataType)) =>
      val rebuilt = struct(s.fields.map(f => uncanon(c.getField(f.name), f.dataType).as(f.name)).toSeq: _*)
      when(c.isNull, lit(null).cast(s)).otherwise(rebuilt)
    case _ => c
  }

  /** `a.exceptAll(b)` under order-insensitive map equality. `b` is
    * aligned to `a`'s column order; the result carries `a`'s exact
    * schema (types re-pinned by cast, so downstream unions see the
    * original map types, not inferred twins). */
  def exceptAll(a: DataFrame, b: DataFrame): DataFrame = {
    val schema = a.schema
    val bAligned = b.select(schema.fieldNames.map(col).toSeq: _*)
    if (!hasMap(schema)) a.exceptAll(bAligned)
    else {
      def enc(df: DataFrame): DataFrame =
        df.select(schema.fields.map(f => canon(col(f.name), f.dataType).as(f.name)).toSeq: _*)
      enc(a).exceptAll(enc(bAligned))
        .select(schema.fields.map(f =>
          uncanon(col(f.name), f.dataType).cast(f.dataType).as(f.name)).toSeq: _*)
    }
  }
}
