package graft.sqlx

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, expr, row_number}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.plans.RowPattern

/** Row-pattern recognition in WINDOW specifications (reference grammar
  * core/trino-grammar/src/main/antlr4/io/trino/grammar/sql/SqlBase.g4:876-880
  * `windowSpecification` → MEASURES/ROWS BETWEEN/AFTER MATCH/PATTERN/DEFINE;
  * runtime core/trino-main io/trino/operator/window/pattern/ — the window
  * flavor of MATCH_RECOGNIZE):
  *
  * {{{
  *   SELECT k, v, m OVER w FROM t
  *   WINDOW w AS (
  *     PARTITION BY k ORDER BY ord
  *     MEASURES SUM(A.v) AS m
  *     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
  *     PATTERN (A+ B)
  *     DEFINE A AS v > 0, B AS v < 0)
  * }}}
  *
  * Semantics (SQL 2016 row-pattern windows; reference
  * docs/src/main/sphinx/sql/pattern-recognition-in-window.md "Processing
  * input"): the partition is processed IN ORDER with AFTER MATCH skip
  * marking. A row skipped by a previous row's match produces NULL
  * measures; otherwise the row attempts a match starting at itself
  * (INITIAL, the default) or at the first subsequent in-frame row that
  * matches (SEEK), the match search space being the frame extent
  * `ROWS BETWEEN CURRENT ROW AND {CURRENT ROW | k FOLLOWING | UNBOUNDED
  * FOLLOWING}`. On a match the measures evaluate with FINAL semantics over
  * it and the AFTER MATCH skip mode (PAST LAST ROW default, TO NEXT ROW,
  * TO [FIRST|LAST] var — RowPattern's skip machinery) marks the skipped
  * rows; unmatched rows appear with NULL measures. Every input row
  * produces exactly one output row.
  *
  * Physical shape: identical to MatchRecognize.annotateMatchesWith — one
  * hash exchange on the partition keys + one sort (pinned by an internal
  * row_number over the same spec, so DEFINE's lag/lead columns reuse the
  * exchange), then a streaming per-group pass. Anchoring at every row costs
  * O(rows × match length) NFA work per partition — the same bound as the
  * reference's per-row matcher loop.
  *
  * Documented subset/divergences: a single named window; select items are
  * plain columns or `measure OVER w [AS alias]`; empty matches are treated
  * as no-match (as in the FROM-clause lowering). Navigation (PREV in
  * DEFINE, and measures) over a BOUNDED frame clips at the frame end via
  * the sliced search space; navigation BELOW the anchor row is clipped
  * only on the stateful DEFINE path — state-independent conditions compile
  * to partition-wide lag/lead columns, so a PREV at the anchor reads the
  * partition value where the reference reads null (divergence kept for the
  * codegen fast path, pinned by the existing oracles).
  */
private[graft] object MatchWindowSql {

  final case class Item(text: String, alias: String, measure: Option[String])

  final case class Mw(table: String, items: Seq[Item],
      partitionBy: Seq[String], orderBy: Seq[String],
      measures: Seq[(String, String)], pattern: String,
      defines: Seq[(String, String)], subsets: Map[String, Seq[String]],
      frameK: Option[Int], seek: Boolean, skip: RowPattern.SkipMode)

  private val Outer =
    """(?is)\s*SELECT\s+(.*?)\s+FROM\s+(\w+)\s+WINDOW\s+(\w+)\s+AS\s*\((.*)\)\s*""".r

  private val windowKeywords = Seq(
    "PARTITION BY", "ORDER BY", "MEASURES", "ROWS BETWEEN", "AFTER MATCH",
    "INITIAL", "SEEK", "PATTERN", "SUBSET", "DEFINE")

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"row-pattern window: $what")

  def parse(text: String): Option[Mw] = text match {
    case Outer(items, table, wName, block) =>
      val cs = MatchRecognizeSql.clauses(block, windowKeywords)
      // only a pattern-bearing window spec lowers here; a plain named
      // window is outside this production
      if (!cs.exists(_._1 == "PATTERN")) return None
      def one(kw: String): Option[String] = cs.collectFirst { case (`kw`, c) => c }
      val parsedItems = MatchRecognizeSql.splitTop(items).map { it =>
        val over = "(?is)^(\\w+)\\s+OVER\\s+(\\w+)(?:\\s+AS\\s+(\\w+))?$".r
        over.findFirstMatchIn(it) match {
          case Some(m) =>
            if (!m.group(2).equalsIgnoreCase(wName))
              fail(s"unknown window '${m.group(2)}' (declared: $wName)")
            Item(m.group(1), Option(m.group(3)).getOrElse(m.group(1)), Some(m.group(1)))
          case None =>
            val plain = "(?is)^(\\w+)(?:\\s+AS\\s+(\\w+))?$".r.findFirstMatchIn(it)
              .getOrElse(fail(s"select item '$it' (plain column or <measure> OVER $wName)"))
            Item(plain.group(1), Option(plain.group(2)).getOrElse(plain.group(1)), None)
        }
      }
      val seek = cs.exists(_._1 == "SEEK")
      // frame extent (SqlBase.g4:879 boundedFrame): the reference requires
      // the frame start at CURRENT ROW; the end bounds the match search
      val frameK: Option[Int] = one("ROWS BETWEEN") match {
        case None => None // default: CURRENT ROW AND UNBOUNDED FOLLOWING
        case Some(f) =>
          val t = f.trim
          if ("(?is)^CURRENT\\s+ROW\\s+AND\\s+UNBOUNDED\\s+FOLLOWING$".r
              .findFirstIn(t).isDefined) None
          else if ("(?is)^CURRENT\\s+ROW\\s+AND\\s+CURRENT\\s+ROW$".r
              .findFirstIn(t).isDefined) Some(0)
          else "(?is)^CURRENT\\s+ROW\\s+AND\\s+(\\d+)\\s+FOLLOWING$".r
            .findFirstMatchIn(t) match {
            case Some(m) => Some(m.group(1).toInt)
            case None => fail(
              "frame must be ROWS BETWEEN CURRENT ROW AND " +
                s"{CURRENT ROW | <n> FOLLOWING | UNBOUNDED FOLLOWING}, got '$t'")
          }
      }
      val partition = MatchRecognizeSql.identList(
        one("PARTITION BY").getOrElse(fail("PARTITION BY <cols>")), "PARTITION BY")
      val order = MatchRecognizeSql.identList(
        one("ORDER BY").getOrElse(fail("ORDER BY <cols>")), "ORDER BY")
      val patternRaw = one("PATTERN").getOrElse(fail("PATTERN (...)")).trim
      require(patternRaw.startsWith("(") && patternRaw.endsWith(")"),
        s"PATTERN must be parenthesized, got '$patternRaw'")
      val subsets = one("SUBSET").map(MatchRecognizeSql.splitTop(_).map { d =>
        val m = "(?is)^\\s*(\\w+)\\s*=\\s*\\(([^)]*)\\)\\s*$".r.findFirstMatchIn(d)
          .getOrElse(fail(s"SUBSET entry '$d'"))
        m.group(1) -> m.group(2).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      }.toMap).getOrElse(Map.empty)
      val defines = MatchRecognizeSql.splitTop(
          one("DEFINE").getOrElse(fail("DEFINE ..."))).map { d =>
        val m = "(?is)^\\s*(\\w+)\\s+AS\\s+(.*)$".r.findFirstMatchIn(d)
          .getOrElse(fail(s"DEFINE entry '$d'"))
        (m.group(1), m.group(2).trim)
      }
      val measures = MatchRecognizeSql.splitTop(
          one("MEASURES").getOrElse(fail("MEASURES ..."))).map { mm =>
        val m = "(?is)^(.*\\S)\\s+AS\\s+(\\w+)\\s*$".r.findFirstMatchIn(mm)
          .getOrElse(fail(s"MEASURES entry '$mm' (expected <expr> AS <alias>)"))
        (m.group(1).trim, m.group(2))
      }
      // every measure referenced by the select list must be declared
      parsedItems.flatMap(_.measure).foreach { m =>
        if (!measures.exists(_._2.equalsIgnoreCase(m)))
          fail(s"measure '$m' is not declared in MEASURES")
      }
      val skip = MatchRecognizeSql.parseSkip(one("AFTER MATCH"), subsets)
      Some(Mw(table, parsedItems, partition, order,
        measures, patternRaw.substring(1, patternRaw.length - 1), defines,
        subsets, frameK, seek, skip))
    case _ => None
  }

  def lower(spark: SparkSession, dir: String, mw: Mw): DataFrame =
    lowerDf(graft.sources.Tables.load(spark, dir, mw.table), mw)

  def lowerDf(full: DataFrame, mw: Mw): DataFrame = {
    val spark = full.sparkSession
    val mr = MatchRecognizeSql.Mr(mw.table, mw.partitionBy, mw.orderBy,
      mw.measures, allRows = false, RowPattern.SkipPastLastRow,
      mw.pattern, mw.defines, mw.subsets)
    val syms = MatchRecognizeSql.patternSymbols(mr)
    val fieldNames = full.schema.fieldNames.toSeq
    def refs(text: String): Seq[String] = {
      val lower = fieldNames.map(f => f.toLowerCase -> f).toMap
      "\\w+".r.findAllIn(text).toSeq.flatMap(w => lower.get(w.toLowerCase)).distinct
    }
    val keep = (mw.partitionBy ++ mw.orderBy ++
      mw.items.filter(_.measure.isEmpty).map(_.text) ++
      mw.defines.flatMap(d => refs(d._2)) ++
      mw.measures.flatMap(m => refs(m._1))).distinct
    var df = full.select(keep.map(col): _*)

    // DEFINE routing, exactly as the FROM-clause lowering: state-independent
    // conditions → codegen'd boolean lag/lead columns; match-state-dependent
    // ones → trace-aware predicates
    val navOver =
      s"OVER (PARTITION BY ${mw.partitionBy.mkString(", ")} ORDER BY ${mw.orderBy.mkString(", ")})"
    val (stateful, simple) =
      mw.defines.partition(d => DefineEval.isStateful(d._2, d._1, syms))
    val defBool = simple.map { case (sym, cond) =>
      val boolCol = s"__def_$sym"
      df = df.withColumn(boolCol,
        expr(MatchRecognizeSql.rewriteDefine(cond, sym, syms, navOver)))
      sym -> boolCol
    }.toMap
    val tracePreds: Map[String, RowPattern.TracePredicate] =
      RowPattern.liftAll(
        graft.plans.MatchRecognize.boolColumnPredicates(df.schema, defBool)) ++
        stateful.map { case (sym, cond) =>
          sym -> DefineEval.compile(spark, df.schema, cond, sym, syms, mw.subsets)
        }

    val schema = df.schema
    val compiled = mw.measures.map { case (e, name) =>
      name -> DefineEval.compileMeasure(spark, schema, e, syms, mw.subsets)
    }
    val matcher = new RowPattern.Matcher(RowPattern.parse(mw.pattern), tracePreds)
    val keyIdx = mw.partitionBy.map(schema.fieldIndex)
    val inWidth = schema.length
    val outSchema = StructType(schema.fields ++
      compiled.map { case (name, cm) => StructField(name, cm.dataType) })
    // the row_number window pins hash-partition + sort; the DEFINE lag/lead
    // columns above share the same exchange (EnsureRequirements reuse)
    val w = Window.partitionBy(mw.partitionBy.map(col): _*)
      .orderBy(mw.orderBy.map(col): _*)
    val annotated = df.withColumn("__mw_rn", row_number().over(w))
      .mapPartitions { it =>
        new Iterator[Seq[Row]] {
          private val buf = it.buffered
          private def keyOf(r: Row): Seq[Any] = keyIdx.map(r.get)
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[Row] = {
            val key = keyOf(buf.head)
            val group = scala.collection.mutable.ArrayBuffer[Row]()
            while (buf.hasNext && keyOf(buf.head) == key) group += buf.next()
            val part = group.toIndexedSeq
            // Sequential processing with AFTER MATCH skip marking
            // (reference pattern-recognition-in-window.md "Processing
            // input"): rows before `skipUntil` were consumed by a previous
            // match and produce NULL measures without attempting.
            var skipUntil = 0
            part.indices.map { i =>
              val base = (0 until inWidth).map(part(i).get)
              if (i < skipUntil) Row.fromSeq(base ++ compiled.map(_ => null))
              else {
                // search space = the frame extent [i, i+k]; bounded frames
                // slice so matching AND navigation clip at the frame end.
                // INITIAL anchors only at i; SEEK advances the anchor to
                // the first in-frame position with a match.
                val (view, off) = mw.frameK match {
                  case None => (part, 0)
                  case Some(k) =>
                    (part.slice(i, math.min(part.length, i + k + 1)), i)
                }
                var rel = i - off
                var m: Option[RowPattern.PatternMatch] = None
                var searching = true
                while (searching && rel < view.length) {
                  m = matcher.anchoredAt(view, rel)
                  searching = m.isEmpty && mw.seek
                  rel += 1
                }
                m match {
                  case Some(pm) =>
                    val trace = pm.steps.reverse.toList // most-recent-first
                    val out = Row.fromSeq(base ++
                      compiled.map(_._2.eval(view, trace, pm.end - 1)))
                    // mark skipped rows (absolute indices); a skip target
                    // at or before the current row simply skips nothing —
                    // window processing advances row by row, so the
                    // MATCH_RECOGNIZE infinite-resume hazard cannot arise
                    skipUntil = mw.skip match {
                      case RowPattern.SkipPastLastRow => off + pm.end
                      case RowPattern.SkipToNextRow => i + 1
                      case RowPattern.SkipToVar(vars, first, label) =>
                        val hits = pm.steps.collect { case (v, j) if vars(v) => j }
                        if (hits.isEmpty) throw new IllegalArgumentException(
                          s"AFTER MATCH SKIP TO $label: variable mapped no rows in the match")
                        off + (if (first) hits.min else hits.max)
                    }
                    out
                  case None =>
                    Row.fromSeq(base ++ compiled.map(_ => null))
                }
              }
            }
          }
        }.flatten
      }(Encoders.row(outSchema))
    annotated.selectExpr(mw.items.map(it => s"${it.text} AS ${it.alias}"): _*)
  }
}
