package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL/JSON 2016 surface subset (SURVEY.md §2.8 JSON row; reference:
  * core/trino-main/src/main/java/io/trino/operator/scalar/json/ — json_value,
  * json_query, json_exists — plus the classic json_extract family in
  * JsonFunctions.java:54).
  *
  * Implemented over Spark's codegen'd JSON path primitives
  * (get_json_object / json_array_length / json_object_keys), which evaluate
  * the lax-mode subset of SQL/JSON paths ($.a.b[0] navigation). Strict-mode
  * error semantics and filter expressions are out of scope — the reference
  * notes the same split between its classic and 2016 engines.
  */
object JsonFunctions {

  /** json_value: extract a scalar as string (lax semantics: missing → null). */
  def jsonValue(json: Column, path: String): Column =
    get_json_object(json, path)

  /** json_value returning a number. */
  def jsonValueDouble(json: Column, path: String): Column =
    get_json_object(json, path).cast("double")

  def jsonValueLong(json: Column, path: String): Column =
    get_json_object(json, path).cast("long")

  /** json_query: extract an object/array fragment as JSON text. */
  def jsonQuery(json: Column, path: String): Column =
    get_json_object(json, path)

  /** json_exists: does the path land on a value? */
  def jsonExists(json: Column, path: String): Column =
    get_json_object(json, path).isNotNull

  /** json_array_length (classic function family). */
  def jsonArrayLength(json: Column): Column =
    json_array_length(json).cast("long")

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** json_value over the full lax/strict path engine (graft.ext.JsonPath) —
    * filters (nested paths, &&/||, path variables), item methods
    * (datetime/size/type/…), wildcards, arithmetic; NULL ON EMPTY /
    * NULL ON ERROR defaults. `vars` is the PASSING analogue: a literal JSON
    * object binding $name path variables. */
  def jsonPathValue(json: Column, path: String, vars: Option[String] = None): Column =
    column(graft.ext.JsonPathValue(expression(json), path, vars))

  /** json_query over the lax/strict path engine (single node, no wrapper). */
  def jsonPathQuery(json: Column, path: String, vars: Option[String] = None): Column =
    column(graft.ext.JsonPathQuery(expression(json), path, vars))

  /** 'value' | 'empty' | 'error' — observable lax/strict outcome. */
  def jsonPathStatus(json: Column, path: String, vars: Option[String] = None): Column =
    column(graft.ext.JsonPathStatus(expression(json), path, vars))
}
