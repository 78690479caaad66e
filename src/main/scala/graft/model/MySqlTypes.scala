package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/** MySQL type-string → Catalyst `DataType` mapping.
  *
  * The reference carries column types verbatim from `SHOW FULL COLUMNS`
  * (`internal/sync_server/baseinfo.go:15-36`, landing in
  * `pkg.MySQLSchema.Type`) and never interprets them; we interpret them so
  * the map-typed envelope can be projected back to a typed DataFrame.
  * `UseDecimal: true` (`internal/sync_server/sync.go:52`) means DECIMAL must
  * stay exact — hence `DecimalType(p, s)`, never double.
  */
object MySqlTypes {

  private val Decimal = """(?:decimal|numeric)\s*\((\d+)\s*,\s*(\d+)\)""".r
  private val DecimalNoScale = """(?:decimal|numeric)\s*\((\d+)\)""".r
  private val Sized = """([a-z]+)\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\)""".r

  /** Normalize a raw MySQL type string: lowercase, drop attributes like
    * `unsigned` / `zerofill`, keep the `(p[,s])` size spec.
    */
  def normalize(raw: String): String =
    raw.trim.toLowerCase
      .replace(" unsigned", "")
      .replace(" zerofill", "")
      .trim

  private def isUnsigned(raw: String): Boolean =
    raw.toLowerCase.contains("unsigned")

  def toCatalyst(raw: String): DataType = {
    val t = normalize(raw)
    val base = t match {
      case Decimal(p, s)     => DecimalType(p.toInt, s.toInt)
      case DecimalNoScale(p) => DecimalType(p.toInt, 0)
      case Sized(name)       => scalarOf(name, isUnsigned(raw))
      case name              => scalarOf(name, isUnsigned(raw))
    }
    base
  }

  private def scalarOf(name: String, unsigned: Boolean): DataType =
    name match {
      case "tinyint"                      => if (unsigned) ShortType else ByteType
      case "smallint"                     => if (unsigned) IntegerType else ShortType
      case "mediumint" | "int" | "integer" => if (unsigned) LongType else IntegerType
      case "bigint"                       => if (unsigned) DecimalType(20, 0) else LongType
      case "float"                        => FloatType
      case "double" | "real"              => DoubleType
      case "bit" | "bool" | "boolean"     => BooleanType
      case "date"                         => DateType
      case "datetime" | "timestamp"       => TimestampType
      case "time"                         => StringType // no TimeType in Spark
      case "year"                         => IntegerType
      case "char" | "varchar" | "text" | "tinytext" | "mediumtext" |
          "longtext" | "enum" | "set" | "json" => StringType
      case "binary" | "varbinary" | "blob" | "tinyblob" | "mediumblob" |
          "longblob" => BinaryType
      case _ => StringType // unknown types degrade to string, never fail
    }

  /** Cast a string-valued envelope column back to its MySQL-declared type. */
  def castColumn(col: Column, mysqlType: String): Column =
    col.cast(toCatalyst(mysqlType))
}
