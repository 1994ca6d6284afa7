package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL routines — `CREATE FUNCTION … RETURNS … RETURN expr` DDL
  * (reference: core/trino-main/src/main/java/io/trino/execution/
  * CreateFunctionTask.java, sql/routine/SqlRoutineCompiler.java).
  *
  * Spark 4 ships native SQL scalar UDFs with the same shape, so the routine
  * body compiles through Catalyst like any expression (inlined and
  * codegen'd at call sites — the same end state as the reference's bytecode
  * compilation of routines). This layer adapts the reference's dialect:
  *
  *  - strips routine characteristics Spark doesn't take (LANGUAGE SQL,
  *    [NOT] DETERMINISTIC, RETURNS NULL ON NULL INPUT, CALLED ON NULL
  *    INPUT, SECURITY DEFINER/INVOKER, COMMENT '…')
  *  - maps parameter/return types to Spark vocabulary (varchar → STRING,
  *    varbinary → BINARY, real → FLOAT)
  *  - runs the RETURN body through the dialect pre-rewriter, so reference
  *    function names (strpos, format, …) work inside routine bodies
  *  - registers as a session (TEMPORARY) function — the session-scope
  *    analogue of the reference's catalog-stored routines.
  */
object SqlRoutines {

  private val Ddl =
    ("(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?FUNCTION\\s+(\\w+)\\s*\\(([^)]*)\\)\\s+" +
      "RETURNS\\s+(\\w+(?:\\s*\\(\\s*\\d+\\s*(?:,\\s*\\d+\\s*)?\\))?)\\s+(.*)$").r

  private val Characteristics =
    "(?is)^(?:LANGUAGE\\s+SQL|NOT\\s+DETERMINISTIC|DETERMINISTIC|" +
      "RETURNS\\s+NULL\\s+ON\\s+NULL\\s+INPUT|CALLED\\s+ON\\s+NULL\\s+INPUT|" +
      "SECURITY\\s+(?:DEFINER|INVOKER)|COMMENT\\s+'[^']*')\\s+"

  def isCreateFunction(text: String): Boolean =
    "(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?FUNCTION\\b".r.findFirstIn(text).isDefined

  private def mapType(t: String): String = t.trim.toLowerCase match {
    case "varchar" => "STRING"
    case v if v.startsWith("varchar(") => v.toUpperCase
    case "varbinary" => "BINARY"
    case "real" => "FLOAT"
    case other => other.toUpperCase
  }

  /** Lower the reference DDL onto Spark's SQL UDF DDL and execute it. */
  def create(spark: SparkSession, text: String): DataFrame = text.trim match {
    case Ddl(name, params, retType, rest) =>
      var tail = rest.trim
      var changed = true
      while (changed) {
        val stripped = tail.replaceFirst(Characteristics, "")
        changed = stripped != tail
        tail = stripped
      }
      require(tail.toUpperCase.startsWith("RETURN"),
        s"CREATE FUNCTION $name: expected RETURN <expr>, got '${tail.take(40)}'")
      val body = graft.sqlx.TrinoDialect.rewrite(tail.substring("RETURN".length).trim)
      val sparkParams = params.split(",").filter(_.trim.nonEmpty).map { p =>
        val parts = p.trim.split("\\s+", 2)
        require(parts.length == 2, s"CREATE FUNCTION $name: parameter '$p' needs <name> <type>")
        s"${parts(0)} ${mapType(parts(1))}"
      }.mkString(", ")
      spark.sql(
        s"CREATE OR REPLACE TEMPORARY FUNCTION $name($sparkParams) " +
          s"RETURNS ${mapType(retType)} RETURN $body")
    case _ => throw new IllegalArgumentException(
      "CREATE FUNCTION subset: CREATE [OR REPLACE] FUNCTION name(p type, …) " +
        "RETURNS type [characteristics] RETURN expr")
  }
}
