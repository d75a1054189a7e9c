package graft.core

import org.apache.spark.sql.types._

/** One column of a declarative table spec — the reference's
  * "describe list" entry `{col_name, data_type, order}`
  * (reference: spark/jobs/job_silver.py:33-50).
  *
  * @param name     output column name
  * @param dataType reference type string (see [[Schema.sparkType]])
  * @param order    1-based output position
  */
final case class ColumnSpec(name: String, dataType: String, order: Int) {
  def sparkType: DataType = Schema.sparkType(dataType)
}

/** The reference's type-string → Spark type mapping
  * (reference: spark/python_libs/decase/decase/utils.py:210-233).
  *
  * Quirk preserved on purpose: `float`, `decimal`, `real`, `money`,
  * `currency` all widen to DOUBLE (utils.py:217-222 comments this as
  * intentional); unknown strings fall back to STRING (utils.py:233).
  */
object Schema {
  def sparkType(s: String): DataType = s.trim.toLowerCase match {
    case "int" | "integer"                                          => IntegerType
    case "long" | "bigint"                                          => LongType
    case "bool" | "boolean"                                         => BooleanType
    case "double" | "float" | "decimal" | "real" | "money" | "currency" => DoubleType
    case "datetime" | "timestamp"                                   => TimestampType
    case "date"                                                     => DateType
    case "string" | "str" | "varchar" | "text"                      => StringType
    case _                                                          => StringType
  }

  /** Describe-list hygiene: drop `'#'`-prefixed rows, which mirror the
    * partition-information section of `DESCRIBE TABLE` output
    * (reference: decase/utils.py:191; job_silver.py:52-61). */
  def clean(spec: Seq[ColumnSpec]): Seq[ColumnSpec] =
    spec.filterNot(_.name.contains("#"))

  /** Spec → StructType in spec order (all nullable, as the reference's
    * conformance produces). */
  def toStructType(spec: Seq[ColumnSpec]): StructType =
    StructType(clean(spec).sortBy(_.order).map(c => StructField(c.name, c.sparkType, nullable = true)))

  /** The canonical brewery describe-list
    * (reference: spark/jobs/job_silver.py:33-50). */
  val brewerySpec: Seq[ColumnSpec] = Seq(
    ColumnSpec("id", "string", 1),
    ColumnSpec("name", "string", 2),
    ColumnSpec("brewery_type", "string", 3),
    ColumnSpec("address_1", "string", 4),
    ColumnSpec("address_2", "string", 5),
    ColumnSpec("address_3", "string", 6),
    ColumnSpec("city", "string", 7),
    ColumnSpec("state_province", "string", 8),
    ColumnSpec("postal_code", "string", 9),
    ColumnSpec("country", "string", 10),
    ColumnSpec("longitude", "float", 11),
    ColumnSpec("latitude", "float", 12),
    ColumnSpec("phone", "bigint", 13),
    ColumnSpec("website_url", "string", 14),
    ColumnSpec("state", "string", 15),
    ColumnSpec("street", "string", 16)
  )
}
