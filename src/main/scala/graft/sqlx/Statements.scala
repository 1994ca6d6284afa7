package graft.sqlx

import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import SqlAst._

/** Statement executor for the SQL front door beyond queries (reference
  * SqlBase.g4 statement :54 — CREATE TABLE AS :68, INSERT :101, DELETE
  * :103, UPDATE :119, EXPLAIN :129, SHOW :137ff; execution analogues in
  * core/trino-main io.trino.execution.*Task).
  *
  * Tables created through this door are the engine's versioned CoW tables
  * (catalog.CowTable — the same MERGE/DELETE/UPDATE/time-travel machinery
  * the DataFrame API exposes), rooted under a per-JVM warehouse directory
  * and registered as temp views so subsequent front-door queries read them
  * by name. Fixture tables stay immutable: DML against a name that is not
  * a front-door table is an error, never a silent mutation of shared
  * fixtures.
  *
  * DuckDB-oracle determinism is the caller's concern (statements have side
  * effects); q_sqlx_statements runs a full CTAS → INSERT → DELETE → UPDATE
  * chain and the oracle replays the chain's NET EFFECT as a pure SELECT. */
private[graft] object Statements {

  /** name → CowTable root, per JVM (the front door's session catalog). */
  private val tables = TrieMap[String, String]()

  private lazy val warehouse: String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_sql_warehouse_${ProcessHandle.current().pid()}")
    Files.createDirectories(p)
    p.toString
  }

  /** Execute `text` if it parses as a non-query statement; None → caller
    * runs the ordinary query path. Throws SqlParseException upward only
    * for statements the grammar doesn't cover at all. */
  def run(spark: SparkSession, dir: String, text: String): Option[DataFrame] =
    new SqlParser(text).parseStatement() match {
      case QueryStmt(_) => None
      case st => Some(execute(spark, dir, st))
    }

  private def subquery(spark: SparkSession, dir: String, q: Query): DataFrame = {
    val planned = SqlFrontend.planQuery(spark, dir, SqlFrontend.rewriteQuery(q))
    spark.sql(SqlFrontend.renderQuery(planned))
  }

  private def condColumn(where: Option[Expr]): Column =
    expr(where.map(w => SqlFrontend.renderExpr(SqlFrontend.rewriteExpr(w)))
      .getOrElse("true"))

  private def openTable(spark: SparkSession, name: String): graft.catalog.CowTable = {
    val root = tables.getOrElse(name.toLowerCase, throw new IllegalArgumentException(
      s"'$name' is not a front-door table — DML applies only to tables " +
        "created via CREATE TABLE AS (fixture tables are immutable)"))
    graft.catalog.CowTable.open(spark, root)
  }

  private def refreshView(spark: SparkSession, name: String): Unit =
    graft.catalog.CowTable.open(spark, tables(name.toLowerCase)).read()
      .createOrReplaceTempView(name)

  private def oneRow(spark: SparkSession, col: String, v: Long): DataFrame =
    spark.createDataFrame(java.util.List.of(Row(v)),
      StructType(Seq(StructField(col, LongType, nullable = false))))

  private def stringRows(spark: SparkSession, col: String, vs: Seq[String]): DataFrame =
    spark.createDataFrame(
      java.util.List.copyOf(scala.jdk.CollectionConverters.SeqHasAsJava(
        vs.map(Row(_))).asJava),
      StructType(Seq(StructField(col, StringType, nullable = false))))

  private def execute(spark: SparkSession, dir: String, st: Statement): DataFrame = st match {
    case CreateTableAs(name, orReplace, ifNotExists, q) =>
      val key = name.toLowerCase
      if (tables.contains(key) && !orReplace) {
        if (ifNotExists) return oneRow(spark, "rows", 0L)
        throw new IllegalArgumentException(s"table '$name' already exists")
      }
      val df = subquery(spark, dir, q)
      val root = Paths.get(warehouse, key + "_" + System.nanoTime()).toString
      graft.catalog.CowTable.create(spark, root, df)
      tables(key) = root
      refreshView(spark, name)
      oneRow(spark, "rows", spark.table(name).count())

    case InsertInto(name, cols, q) =>
      val ct = openTable(spark, name)
      val incoming = subquery(spark, dir, q)
      val schema = ct.read().schema
      val target = schema.fieldNames
      val positioned =
        if (cols.isEmpty) {
          require(incoming.columns.length == target.length,
            s"INSERT arity ${incoming.columns.length} != table arity ${target.length}")
          incoming.toDF(target.toIndexedSeq: _*)
        } else {
          require(cols.length == incoming.columns.length,
            s"INSERT column list arity ${cols.length} != query arity ${incoming.columns.length}")
          // positional into the named columns; unnamed target columns get NULL
          val renamed = incoming.toDF(cols.toIndexedSeq: _*)
          val full = target.map { t =>
            if (cols.exists(_.equalsIgnoreCase(t)))
              renamed(cols.find(_.equalsIgnoreCase(t)).get).as(t)
            else org.apache.spark.sql.functions.lit(null).as(t)
          }
          renamed.select(full.toIndexedSeq: _*)
        }
      // exact target types: an INT literal into a BIGINT column must land
      // as BIGINT bytes, or a later mixed-file read breaks
      val aligned = positioned.select(schema.fields.toIndexedSeq.map(f =>
        positioned(f.name).cast(f.dataType).as(f.name)): _*)
      val n = aligned.count()
      ct.insert(aligned)
      refreshView(spark, name)
      oneRow(spark, "rows", n)

    case DeleteStmt(name, where) =>
      val ct = openTable(spark, name)
      val before = ct.read().count()
      ct.delete(condColumn(where))
      refreshView(spark, name)
      oneRow(spark, "rows", before - ct.read().count())

    case UpdateStmt(name, sets, where) =>
      val ct = openTable(spark, name)
      val cond = condColumn(where)
      val affected = ct.read().filter(cond).count()
      ct.update(cond, sets.map { case (c, e) =>
        c -> expr(SqlFrontend.renderExpr(SqlFrontend.rewriteExpr(e)))
      }.toMap)
      refreshView(spark, name)
      oneRow(spark, "rows", affected)

    case DropTableStmt(name, ifExists) =>
      tables.remove(name.toLowerCase) match {
        case Some(_) =>
          spark.catalog.dropTempView(name)
          oneRow(spark, "rows", 0L)
        case None if ifExists => oneRow(spark, "rows", 0L)
        case None => throw new IllegalArgumentException(s"table '$name' does not exist")
      }

    case ExplainStmt(analyze, q) =>
      val df = subquery(spark, dir, q)
      val textOut =
        if (analyze) graft.engine.ExplainAnalyze.report(df)
        else df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      stringRows(spark, "plan", textOut.linesIterator.toSeq)

    case ShowStmt("TABLES") =>
      val views = spark.catalog.listTables().collect().map(_.name).toSeq
      stringRows(spark, "table", (views ++ tables.keys).distinct.sorted)

    case ShowStmt("SCHEMAS") =>
      stringRows(spark, "schema",
        spark.catalog.listDatabases().collect().map(_.name).toSeq.sorted)

    case ShowStmt("CATALOGS") =>
      val dsv2 = spark.conf.getAll.keys
        .collect { case k if k.matches("spark\\.sql\\.catalog\\.\\w+") =>
          k.stripPrefix("spark.sql.catalog.") }.toSeq
      stringRows(spark, "catalog", ("graft" +: dsv2).distinct.sorted)

    case ShowStmt("FUNCTIONS") =>
      stringRows(spark, "function", graft.functions.Registry.customFunctions.sorted)

    case ShowStmt(other) =>
      throw new SqlParseException(s"SHOW $other is not supported")

    case DescribeStmt(name) =>
      val schema = spark.table(name).schema
      spark.createDataFrame(
        java.util.List.copyOf(scala.jdk.CollectionConverters.SeqHasAsJava(
          schema.fields.toSeq.map(f => Row(f.name, f.dataType.simpleString))).asJava),
        StructType(Seq(StructField("column", StringType, nullable = false),
          StructField("type", StringType, nullable = false))))

    case CreateTableCols(name, ifNotExists, cols) =>
      val key = name.toLowerCase
      if (tables.contains(key)) {
        if (ifNotExists) return oneRow(spark, "rows", 0L)
        throw new IllegalArgumentException(s"table '$name' already exists")
      }
      // reference type spellings → Spark type strings
      def sparkType(t: String): String = t.trim.toLowerCase match {
        case "varchar" => "string"
        case v if v.startsWith("varchar(") => "string" // unbounded semantics
        case "varbinary" => "binary"
        case "real" => "float"
        case "double precision" => "double"
        case other => other
      }
      val schema = StructType(cols.map { case (c, t) =>
        StructField(c, org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(sparkType(t)))
      })
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
      val root = Paths.get(warehouse, key + "_" + System.nanoTime()).toString
      graft.catalog.CowTable.create(spark, root, empty)
      tables(key) = root
      refreshView(spark, name)
      oneRow(spark, "rows", 0L)

    case CreateViewStmt(name, orReplace, q) =>
      if (!orReplace && spark.catalog.tableExists(name))
        throw new IllegalArgumentException(s"view '$name' already exists")
      subquery(spark, dir, q).createOrReplaceTempView(name)
      oneRow(spark, "rows", 0L)

    case MergeStmt(name, source, key) =>
      val ct = openTable(spark, name)
      val src = subquery(spark, dir, source)
      val n = src.count()
      ct.merge(src, key)
      refreshView(spark, name)
      oneRow(spark, "rows", n)

    case QueryStmt(_) => throw new IllegalStateException("unreachable")
  }
}
