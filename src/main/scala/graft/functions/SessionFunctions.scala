package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Session/system scalar functions (reference:
  * core/trino-main/src/main/java/io/trino/operator/scalar/SessionFunctions.java,
  * TypeOfFunction.java, VersionFunction.java).
  *
  * `typeof` reports the ANALYSIS-TIME type of its argument in the reference's
  * type vocabulary (bigint/varchar/…), not Spark's — the expression is
  * foldable, so Catalyst constant-folds it to a literal and it never costs
  * per-row work. `current_user` defers to Spark's session user;
  * `current_catalog`/`version` identify this engine.
  */
object SessionFunctions {

  /** Engine identity string, the version() analogue. */
  val engineVersion: String = s"graft-0.1.0 (spark ${org.apache.spark.SPARK_VERSION})"

  val catalogName: String = "graft"

  /** Spark type → reference type name (spi/type naming). */
  def typeName(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case StringType => "varchar"
    case BinaryType => "varbinary"
    case DateType => "date"
    case TimestampType => "timestamp(6) with time zone"
    case TimestampNTZType => "timestamp(6)"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case a: ArrayType => s"array(${typeName(a.elementType)})"
    case m: MapType => s"map(${typeName(m.keyType)}, ${typeName(m.valueType)})"
    case s: StructType =>
      s"row(${s.fields.map(f => s"${f.name} ${typeName(f.dataType)}").mkString(", ")})"
    case other => other.simpleString
  }

  def register(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("typeof", es => TrinoTypeOf(es(0)), "built-in")
    // session identity residuals (SessionFunctions.java): all foldable
    // literals at plan time, like the reference's @SqlNullable constants
    r.createOrReplaceTempFunction("current_timezone",
      _ => org.apache.spark.sql.catalyst.expressions.Literal(
        spark.sessionState.conf.sessionLocalTimeZone), "built-in")
    r.createOrReplaceTempFunction("current_catalog",
      _ => org.apache.spark.sql.catalyst.expressions.Literal(catalogName), "built-in")
    r.createOrReplaceTempFunction("current_schema",
      _ => org.apache.spark.sql.catalyst.expressions.Literal("default"), "built-in")
    r.createOrReplaceTempFunction("current_path",
      _ => org.apache.spark.sql.catalyst.expressions.Literal(""), "built-in")
    // local[*] has no group memberships; the reference returns the
    // enumerating array for the session principal
    r.createOrReplaceTempFunction("current_groups",
      _ => org.apache.spark.sql.catalyst.expressions.CreateArray(Seq.empty), "built-in")
  }
}

/** typeof(x) → reference type name of x's resolved type; foldable, so the
  * optimizer reduces it to a string literal at plan time
  * (reference: operator/scalar/TypeOfFunction.java). */
case class TrinoTypeOf(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "typeof"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    UTF8String.fromString(SessionFunctions.typeName(child.dataType))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
