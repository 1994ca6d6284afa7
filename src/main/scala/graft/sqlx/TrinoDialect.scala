package graft.sqlx

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType}

import graft.plans.{MatchRecognize, RowPattern}

/** Trino-dialect pre-rewrite layer (SURVEY.md §3 "sqlx/"): accepts SQL text in
  * the reference's dialect and lowers it onto Spark.
  *
  * The reference parses this surface in its own grammar
  * (reference: core/trino-grammar/src/main/antlr4/io/trino/grammar/sql/SqlBase.g4 —
  * TRY at the primaryExpression rule, patternRecognition at :446). Here the
  * dialect gap is closed by a *pre-rewriter*, not a second parser: Catalyst
  * remains the only SQL engine, and this layer only renames/reshapes the
  * Trino-isms Spark's parser rejects or interprets differently:
  *
  *  - TRY(CAST(x AS T))      → TRY_CAST(x AS T)
  *  - TRY(element_at(a, i))  → try_element_at(a, i)
  *  - TRY(a / b)             → try_divide(a, b)
  *    (other TRY bodies are rejected with a clear error — Trino's TRY guards
  *    exactly cast/lookup/arithmetic failures, which map onto Spark's try_*
  *    family; a generic catch-per-row does not exist in Spark)
  *  - format('fmt', …)       → format_string('fmt', …)
  *  - approx_distinct/arbitrary/strpos/codepoint/json_extract_scalar →
  *    approx_count_distinct/any_value/instr/ascii/get_json_object
  *  - FETCH FIRST n ROWS ONLY → LIMIT n
  *  - element_at keeps Trino semantics natively (Spark 4 ANSI: array OOB
  *    throws, missing map key is NULL — same as the reference).
  *  - SELECT * FROM t MATCH_RECOGNIZE (…) → graft.plans.MatchRecognize
  *    (subset: single partition/order columns, DEFINE `col op PREV(col)` or
  *    `col op literal`, measures FIRST/LAST/COUNT, both per-match modes).
  *
  * Rewrites are textual and documented as a subset — the point is the dialect
  * *surface*, with Catalyst doing all real SQL work after the rewrite.
  */
object TrinoDialect {

  /** Execute Trino-dialect SQL against the fixture catalog at `dir`. */
  def sql(spark: SparkSession, dir: String, text: String): DataFrame =
    MatchRecognizeSql.parse(text) match {
      case Some(mr) => MatchRecognizeSql.lower(spark, dir, mr)
      case None =>
        graft.sources.Tables.registerAll(spark, dir)
        spark.sql(rewrite(lowerTableFunctions(spark, dir, text)))
    }

  /** `FROM TABLE(name(args...))` → registered TVF materialized as a temp view
    * (reference ConnectorTableFunction resolution; graft.functions.TableFunctions).
    * Text-surface subset: scalar literal args without nested parens or commas
    * inside quotes — TVFs with full SQL args (e.g. raw_query) are reachable
    * through the Scala API (`TableFunctions.invoke`). */
  private def lowerTableFunctions(spark: SparkSession, dir: String, sqlText: String): String = {
    val TvfRe = """(?i)TABLE\s*\(\s*(\w+)\s*\(([^()]*)\)\s*\)""".r
    TvfRe.replaceAllIn(sqlText, m => {
      val name = m.group(1)
      val args = if (m.group(2).trim.isEmpty) Seq.empty[String]
        else m.group(2).split(",").toSeq.map(_.trim)
      val view = s"tvf_${name}_${Integer.toHexString(m.group(2).hashCode).replace('-', 'n')}"
      graft.functions.TableFunctions.invoke(spark, dir, name, args)
        .createOrReplaceTempView(view)
      view
    })
  }

  /** Textual pre-rewrites for Trino-isms (no MATCH_RECOGNIZE here). */
  def rewrite(sql: String): String = {
    var s = rewriteTry(sql)
    // CROSS JOIN UNNEST(expr) AS t (v)  →  LATERAL VIEW explode(expr) t AS v
    // (reference SqlBase.g4 unnest rule; ordinality variant is q_unnest's
    // posexplode surface — not rewritten textually)
    s = s.replaceAll(
      "(?is)CROSS\\s+JOIN\\s+UNNEST\\s*\\(([^()]*(?:\\([^()]*\\))?[^()]*)\\)\\s+AS\\s+(\\w+)\\s*\\(\\s*(\\w+)\\s*\\)",
      "LATERAL VIEW explode($1) $2 AS $3")
    // Trino reduce(array, init, merge, final) ≡ Spark aggregate(...)
    s = s.replaceAll("(?i)(?<![\\w_])reduce\\s*\\(", "aggregate(")
    s = s.replaceAll("(?i)(?<![\\w_])format\\s*\\(", "format_string(")
    s = s.replaceAll("(?i)(?<![\\w_])approx_distinct\\s*\\(", "approx_count_distinct(")
    s = s.replaceAll("(?i)(?<![\\w_])arbitrary\\s*\\(", "any_value(")
    s = s.replaceAll("(?i)(?<![\\w_])strpos\\s*\\(", "instr(")
    s = s.replaceAll("(?i)(?<![\\w_])codepoint\\s*\\(", "ascii(")
    s = s.replaceAll("(?i)(?<![\\w_])json_extract_scalar\\s*\\(", "get_json_object(")
    s = s.replaceAll("(?i)FETCH\\s+FIRST\\s+(\\d+)\\s+ROWS\\s+ONLY", "LIMIT $1")
    s
  }

  /** Rewrite every TRY(...) by classifying its (balanced) body. */
  private def rewriteTry(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    val upper = sql.toUpperCase
    while (i < sql.length) {
      val at = upper.indexOf("TRY", i)
      val isWord = at >= 0 &&
        (at == 0 || !Character.isLetterOrDigit(sql(at - 1)) && sql(at - 1) != '_') &&
        sql.drop(at + 3).dropWhile(_.isWhitespace).headOption.contains('(') &&
        !upper.startsWith("TRY_CAST", at) // already Spark-compatible
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (!isWord) { out.append(sql.substring(i, at + 3)); i = at + 3 }
      else {
        out.append(sql.substring(i, at))
        val open = sql.indexOf('(', at)
        val close = matchParen(sql, open)
        val body = sql.substring(open + 1, close).trim
        out.append(lowerTryBody(body))
        i = close + 1
      }
    }
    out.toString
  }

  private def lowerTryBody(body: String): String = {
    val u = body.toUpperCase
    // a top-level division wins even when its left operand is a CAST
    topLevelSlash(body) match {
      case Some(slash) =>
        s"try_divide(${body.substring(0, slash).trim}, ${body.substring(slash + 1).trim})"
      case None if u.startsWith("CAST") => "TRY_" + body
      case None if u.startsWith("ELEMENT_AT") =>
        val open = body.indexOf('(')
        "try_element_at" + body.substring(open, matchParen(body, open) + 1)
      case None => throw new IllegalArgumentException(
        s"TRY($body): unsupported body — the dialect layer lowers TRY over " +
          "CAST, element_at, and division (Spark try_cast/try_element_at/try_divide)")
    }
  }

  /** Index of the ')' matching the '(' at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      if (s(i) == '(') depth += 1
      else if (s(i) == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  /** Position of a '/' at paren-depth 0, if any. */
  private def topLevelSlash(s: String): Option[Int] = {
    var depth = 0; var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '/' if depth == 0 => return Some(i)
        case _ =>
      }
      i += 1
    }
    None
  }
}

/** MATCH_RECOGNIZE SQL surface → graft.plans.MatchRecognize lowering.
  *
  * Grammar subset (reference grammar SqlBase.g4:446):
  * {{{
  * SELECT * FROM <table> MATCH_RECOGNIZE (
  *   PARTITION BY <col>
  *   ORDER BY <col>
  *   [MEASURES FIRST(S.col)|LAST(S.col)|COUNT(S.*) AS name, ...]
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW]
  *   PATTERN ( <pattern> )
  *   DEFINE S AS <col op PREV(col) | col op literal>, ...
  * )
  * }}}
  */
private[sqlx] object MatchRecognizeSql {

  final case class Mr(
      table: String, partitionBy: String, orderBy: String,
      measures: Seq[(String, String)], // (expr, alias)
      allRows: Boolean, skipPastLastRow: Boolean,
      pattern: String, defines: Seq[(String, String)])

  private val Outer =
    """(?is)\s*SELECT\s+\*\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*""".r

  def parse(text: String): Option[Mr] = text match {
    case Outer(table, block) =>
      def grab(re: scala.util.matching.Regex): Option[String] =
        re.findFirstMatchIn(block).map(_.group(1).trim)
      val partition = grab("(?is)PARTITION\\s+BY\\s+(\\w+)".r)
        .getOrElse(fail("PARTITION BY <col>"))
      val order = grab("(?is)ORDER\\s+BY\\s+(\\w+)".r).getOrElse(fail("ORDER BY <col>"))
      val pattern = grab("(?is)PATTERN\\s*\\(([^)]*)\\)".r).getOrElse(fail("PATTERN (...)"))
      val defines = grab("(?is)DEFINE\\s+(.*)$".r).getOrElse(fail("DEFINE ..."))
        .split(",").toSeq.map { d =>
          val m = "(?is)\\s*(\\w+)\\s+AS\\s+(.*)".r.findFirstMatchIn(d)
            .getOrElse(fail(s"DEFINE entry '$d'"))
          (m.group(1), m.group(2).trim)
        }
      val measures = grab("(?is)MEASURES\\s+(.*?)(?=ONE\\s+ROW|ALL\\s+ROWS|AFTER\\s+MATCH|PATTERN)".r)
        .map(_.split(",").toSeq.map { mm =>
          val m = "(?is)\\s*(.*?)\\s+AS\\s+(\\w+)\\s*".r.findFirstMatchIn(mm)
            .getOrElse(fail(s"MEASURES entry '$mm'"))
          (m.group(1).trim, m.group(2))
        }).getOrElse(Seq.empty)
      val allRows = "(?is)ALL\\s+ROWS\\s+PER\\s+MATCH".r.findFirstIn(block).isDefined
      val skipPast = "(?is)SKIP\\s+TO\\s+NEXT\\s+ROW".r.findFirstIn(block).isEmpty
      Some(Mr(table, partition, order, measures, allRows, skipPast, pattern, defines))
    case _ => None
  }

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"MATCH_RECOGNIZE subset requires $what")

  def lower(spark: SparkSession, dir: String, mr: Mr): DataFrame = {
    import org.apache.spark.sql.functions.col
    val full = graft.sources.Tables.load(spark, dir, mr.table)

    // columns the DEFINE/MEASURES clauses touch, in stable order
    val defCols = mr.defines.flatMap(d => colRefs(d._2, full)).distinct
    val projected = (Seq(mr.partitionBy, mr.orderBy) ++ defCols).distinct
    val df = full.select(projected.map(col): _*)
    val schema = df.schema

    def num(r: Row, i: Int): Double = r.get(i) match {
      case d: java.lang.Double => d
      case f: java.lang.Float => f.toDouble
      case l: java.lang.Long => l.toDouble
      case n: java.lang.Integer => n.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric DEFINE operand: $other")
    }
    def cmp(op: String): (Double, Double) => Boolean = op match {
      case "<" => _ < _
      case ">" => _ > _
      case "<=" => _ <= _
      case ">=" => _ >= _
      case "=" => _ == _
      case "<>" => _ != _
    }
    val CondPrev = """(?i)\s*(\w+)\s*(<=|>=|<>|=|<|>)\s*PREV\s*\(\s*(\w+)\s*\)\s*""".r
    val CondLit = """(?i)\s*(\w+)\s*(<=|>=|<>|=|<|>)\s*(-?[\d.]+)\s*""".r
    val define: Map[String, RowPattern.Predicate] = mr.defines.map {
      case (sym, CondPrev(c1, op, c2)) =>
        val i1 = schema.fieldIndex(c1); val i2 = schema.fieldIndex(c2); val f = cmp(op)
        sym -> ((p: IndexedSeq[Row], i: Int) => i > 0 && f(num(p(i), i1), num(p(i - 1), i2)))
      case (sym, CondLit(c1, op, litv)) =>
        val i1 = schema.fieldIndex(c1); val f = cmp(op); val v = litv.toDouble
        sym -> ((p: IndexedSeq[Row], i: Int) => f(num(p(i), i1), v))
      case (_, other) => throw new IllegalArgumentException(
        s"DEFINE subset supports 'col op PREV(col)' and 'col op literal', got '$other'")
    }.toMap

    if (mr.allRows) {
      MatchRecognize.allRowsPerMatch(
        df, mr.partitionBy, mr.orderBy, mr.pattern, define,
        includeCols = (Seq(mr.orderBy) ++ defCols).distinct,
        skipPastLastRow = mr.skipPastLastRow)
    } else {
      val MFirst = """(?i)FIRST\s*\(\s*(\w+)\.(\w+)\s*\)""".r
      val MLast = """(?i)LAST\s*\(\s*(\w+)\.(\w+)\s*\)""".r
      val MCount = """(?i)COUNT\s*\(\s*(\w+)\.\*\s*\)""".r
      val measures = mr.measures.map {
        case (MFirst(sym, c), alias) =>
          val i = schema.fieldIndex(c); val dt: DataType = schema(c).dataType
          MatchRecognize.Measure(alias, dt, (p, m) => p(m.firstIdx(sym)).get(i))
        case (MLast(sym, c), alias) =>
          val i = schema.fieldIndex(c); val dt: DataType = schema(c).dataType
          MatchRecognize.Measure(alias, dt, (p, m) => p(m.lastIdx(sym)).get(i))
        case (MCount(sym), alias) =>
          MatchRecognize.Measure(alias, LongType, (_, m) => m.countOf(sym))
        case (other, _) => throw new IllegalArgumentException(
          s"MEASURES subset supports FIRST(S.col)/LAST(S.col)/COUNT(S.*), got '$other'")
      }
      MatchRecognize.oneRowPerMatch(
        df, mr.partitionBy, mr.orderBy, mr.pattern, define, measures,
        skipPastLastRow = mr.skipPastLastRow)
    }
  }

  /** Column names of `df` referenced in a DEFINE condition string. */
  private def colRefs(cond: String, df: DataFrame): Seq[String] = {
    val names = df.schema.fieldNames.toSet
    "\\w+".r.findAllIn(cond).toSeq.filter(names.contains).distinct
  }
}
