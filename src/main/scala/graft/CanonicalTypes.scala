package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The reference's closed 6-type canonical result schema, re-expressed on Spark.
  *
  * dungbeetle infers column types from the live result set and canonicalizes
  * them into {BIGINT, DECIMAL, TIMESTAMP, DATE, BOOLEAN, TEXT/VARCHAR} (+ JSON
  * and PG-array passthrough) before creating the per-job result table
  * (`internal/resultbackends/sqldb/sqldb.go:254-281`). Here the same
  * canonicalization happens on the DataFrame before materialization: every
  * result column is cast to the canonical Spark type for its class, and
  * nullability is preserved the way `sqldb.go:283-285` preserves NOT NULL.
  *
  * Arrays (the PG `_INT4/_INT8/_TEXT` passthrough, `sqldb.go:273-276`) and
  * structs/maps (Spark-native extension; the reference only has JSON-as-text)
  * are kept as-is with their element types canonicalized.
  */
object CanonicalTypes {

  /** Canonical Spark type for an inferred source type (sqldb.go:254-281). */
  def canonicalize(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType   // -> BIGINT
    case FloatType | DoubleType | _: DecimalType       => DoubleType // -> DECIMAL class
    case TimestampType | TimestampNTZType              => TimestampType
    case DateType                                      => DateType
    case BooleanType                                   => BooleanType
    case StringType | BinaryType | CharType(_) | VarcharType(_) => dt match {
      case BinaryType => BinaryType
      case _          => StringType                                  // -> TEXT/VARCHAR
    }
    case ArrayType(et, n)      => ArrayType(canonicalize(et), n)
    case StructType(fields)    => StructType(fields.map(f => f.copy(dataType = canonicalize(f.dataType))))
    case MapType(k, v, n)      => MapType(canonicalize(k), canonicalize(v), n)
    case NullType              => StringType
    case other                 => other // CalendarInterval etc.: passthrough (TEXT class)
  }

  def canonicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(dataType = canonicalize(f.dataType))))

  /** Cast every column of `df` to its canonical type (no-op casts elided). */
  def castToCanonical(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val target = canonicalize(f.dataType)
      if (target == f.dataType) col(f.name) else col(f.name).cast(target).as(f.name)
    }
    df.select(cols: _*)
  }
}
