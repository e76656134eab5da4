package graft

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Spark JDBC dialect for ClickHouse source/result databases.
  *
  * The reference explicitly supports ClickHouse as a source DB — its task
  * files tag `-- db: my_clickhouse` pools and the SQL is delegated verbatim
  * (`cmd/main.go` dbpool config; `internal/core/core.go:496`). Spark ships
  * dialects for MySQL/Postgres/etc. but not ClickHouse, so without this the
  * generic dialect double-quotes identifiers (ClickHouse wants backticks or
  * double quotes, but backticks match its own SHOW CREATE output), maps every
  * unsigned type to the wrong Catalyst type, and emits TEXT/NUMERIC DDL that
  * ClickHouse rejects on the result-backend write path.
  *
  * Type maps follow the public ClickHouse SQL reference:
  *  - reads unwrap `Nullable(T)` / `LowCardinality(T)` and map the scalar
  *    core (UInt8..UInt64, Int8..Int64, Float32/64, Decimal(p,s), String,
  *    FixedString(n), UUID, Enum8/16, Date/Date32, DateTime[64], Bool,
  *    Array(T) recursively);
  *  - writes emit the canonical 6-type result schema (§1.2 /
  *    [[CanonicalTypes]]) as Int64 / Float64 / DateTime64(6) / Date32 /
  *    Bool / String — the ClickHouse spelling of the reference's
  *    BIGINT/DECIMAL/TIMESTAMP/DATE/BOOLEAN/TEXT canonicalization
  *    (sqldb.go:254-281).
  *
  * UInt64 maps to Decimal(20,0) on read: the full unsigned range does not
  * fit a Catalyst LongType, and silently wrapping negative would corrupt
  * ids — the same overflow-safety choice Spark's own MySQL dialect makes
  * for BIGINT UNSIGNED.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean = {
    val u = url.toLowerCase(Locale.ROOT)
    u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:")
  }

  /** Backtick-quote, doubling embedded backticks (ClickHouse's own escape). */
  override def quoteIdentifier(colName: String): String =
    "`" + colName.replace("`", "``") + "`"

  /** Strip `Nullable(...)` / `LowCardinality(...)` wrappers (they change
    * nullability/encoding, not the value type). */
  private[graft] def unwrap(typeName: String): String = {
    val t = typeName.trim
    val wrappers = Seq("Nullable(", "LowCardinality(")
    wrappers.find(t.startsWith) match {
      case Some(w) if t.endsWith(")") => unwrap(t.substring(w.length, t.length - 1))
      case _ => t
    }
  }

  private val decimalRe = """Decimal\((\d+)\s*,\s*(\d+)\)""".r
  private val decimalSizedRe = """Decimal(32|64|128|256)\((\d+)\)""".r
  private val arrayRe = """Array\((.+)\)""".r

  /** ClickHouse type name → Catalyst type (None = let Spark's generic
    * JDBC mapping decide from the java.sql.Types code). */
  private[graft] def catalystFor(typeName: String): Option[DataType] =
    unwrap(typeName) match {
      case "Int8"                  => Some(ByteType)
      case "Int16" | "UInt8"       => Some(ShortType)
      case "Int32" | "UInt16"      => Some(IntegerType)
      case "Int64" | "UInt32"      => Some(LongType)
      case "UInt64"                => Some(DecimalType(20, 0)) // full unsigned range
      case "Float32"               => Some(FloatType)
      case "Float64"               => Some(DoubleType)
      case "Bool"                  => Some(BooleanType)
      case "Date" | "Date32"       => Some(DateType)
      case t if t.startsWith("DateTime") => Some(TimestampType)
      case "String" | "UUID" | "IPv4" | "IPv6" => Some(StringType)
      case t if t.startsWith("FixedString") => Some(StringType)
      case t if t.startsWith("Enum")        => Some(StringType)
      case decimalRe(p, s)         => Some(DecimalType(p.toInt, s.toInt))
      case decimalSizedRe(bits, s) =>
        val precision = bits match {
          case "32" => 9; case "64" => 18; case "128" => 38
          case _    => 38 // Decimal256's 76 digits exceed Catalyst's max
        }
        Some(DecimalType(precision, s.toInt))
      case arrayRe(inner)          => catalystFor(inner).map(ArrayType(_, true))
      case _                       => None
    }

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    catalystFor(typeName)

  /** Catalyst → ClickHouse DDL type for the result-backend CREATE TABLE.
    * Covers every type [[CanonicalTypes.canonicalize]] can emit. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case ByteType      => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType     => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType   => Some(JdbcType("Int32", Types.INTEGER))
    case LongType      => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType     => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType    => Some(JdbcType("Float64", Types.DOUBLE))
    case BooleanType   => Some(JdbcType("Bool", Types.BOOLEAN))
    case DateType      => Some(JdbcType("Date32", Types.DATE))
    // microsecond precision — matches the engine-wide ts canonical unit
    case TimestampType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case StringType    => Some(JdbcType("String", Types.VARCHAR))
    case BinaryType    => Some(JdbcType("String", Types.BINARY))
    case t: DecimalType =>
      Some(JdbcType(s"Decimal(${t.precision}, ${t.scale})", Types.DECIMAL))
    case ArrayType(et, _) =>
      getJDBCType(et).map(inner => JdbcType(s"Array(${inner.databaseTypeDefinition})", Types.ARRAY))
    case _ => None
  }

  override def getTruncateQuery(table: String,
      cascade: Option[Boolean] = isCascadingTruncateTable()): String =
    s"TRUNCATE TABLE $table"

  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** Result tables need an engine clause; `Executor` appends this via the
    * `createTableOptions` write option when the backend is ClickHouse. A
    * per-job result table has no natural ordering key — the reference
    * creates plain (UNLOGGED) tables too (sqldb.go:159-188). */
  val resultTableEngine = "ENGINE = MergeTree() ORDER BY tuple()"

  /** Idempotent global registration (Spark keeps one dialect registry per
    * JVM; re-registering replaces, so guard on first use). */
  @volatile private var registered = false
  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
