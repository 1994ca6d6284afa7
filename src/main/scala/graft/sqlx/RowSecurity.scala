package graft.sqlx

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import SqlAst._

/** Row filters and column masks (reference: core/trino-spi
  * io/trino/spi/connector/ConnectorAccessControl.java:835 `getRowFilters`
  * and :848 `getColumnMasks` — the engine asks access control for a filter
  * expression and per-column mask expressions for (table, identity) and
  * splices them into the plan BEFORE optimization, so the user can never
  * observe a row or value the policy hides, regardless of what the query
  * does with the table).
  *
  * Same shape here: policies are recorded per (user, table); the SQL front
  * door rewrites every `TableRef` an ENFORCED user touches into
  * `(SELECT col…, mask AS col… FROM t WHERE filter) AS t` before planning.
  * Because the splice happens at the AST, Catalyst then pushes the filter
  * into the scan like any other predicate — at 100 TB the policy predicate
  * prunes partitions/row groups exactly like a user WHERE clause, no
  * post-filter pass. Unenforced identities (admins, in-process callers)
  * never hit the rewrite. */
private[graft] object RowSecurity {

  /** (user, table key) → filter SQL text (dialect expression). */
  private val rowFilters = TrieMap[(String, String), String]()

  /** (user, table key) → column (lowercase) → mask SQL text. */
  private val columnMasks = TrieMap[(String, String), Map[String, String]]()

  def setRowFilter(user: String, table: String, filterSql: String): Unit =
    rowFilters((user, table.toLowerCase)) = filterSql

  def dropRowFilter(user: String, table: String): Unit =
    rowFilters.remove((user, table.toLowerCase))

  def setColumnMask(user: String, table: String, column: String,
      maskSql: String): Unit = {
    val key = (user, table.toLowerCase)
    columnMasks(key) =
      columnMasks.getOrElse(key, Map.empty) + (column.toLowerCase -> maskSql)
  }

  def dropColumnMask(user: String, table: String, column: String): Unit = {
    val key = (user, table.toLowerCase)
    columnMasks.get(key).foreach { m =>
      val next = m - column.toLowerCase
      if (next.isEmpty) columnMasks.remove(key) else columnMasks(key) = next
    }
  }

  def clearAll(): Unit = { rowFilters.clear(); columnMasks.clear() }

  private def hasPolicy(user: String): Boolean =
    rowFilters.keysIterator.exists(_._1 == user) ||
      columnMasks.keysIterator.exists(_._1 == user) ||
      OpaPolicy.shapesRows // a configured agent may shape any table

  /** Table key for a TableRef's name parts, mirroring the resolution the
    * grant checks use: schema-qualified front-door names stay two-part,
    * session-schema names resolve through the registry, base tables are
    * their lowercase name. */
  private def keyFor(parts: Seq[String]): String = parts match {
    case Seq(schema, table) if Statements.isSchema(schema.toLowerCase) =>
      s"${schema.toLowerCase}.${table.toLowerCase}"
    case Seq(table) =>
      Statements.resolveTableKey(table.toLowerCase).getOrElse(table.toLowerCase)
    case other => other.map(_.toLowerCase).mkString(".")
  }

  /** Column names of the relation `parts` names, resolved the same way the
    * planner will (front-door temp view, then raw name). */
  private def columnsOf(spark: SparkSession, parts: Seq[String]): Seq[String] = {
    val candidates = Seq(
      Statements.viewNameOf(keyFor(parts)), parts.map(_.toLowerCase).mkString("."))
    candidates.flatMap { n =>
      try Some(spark.table(n).schema.fieldNames.toSeq)
      catch { case _: Exception => None }
    }.headOption.getOrElse(throw new AccessDeniedException(
      s"Cannot resolve columns of ${parts.mkString(".")} for policy masking"))
  }

  /** Splice the user's policies into `q`. No-op when the user has none. */
  def secure(q: Query, user: String, spark: SparkSession): Query =
    if (!hasPolicy(user)) q else secureQuery(q, user, spark, Set.empty)

  private def secureQuery(q: Query, user: String, spark: SparkSession,
      ctes: Set[String]): Query = q match {
    case s: Select => s.copy(
      items = s.items.map(i => SelectItem(secureExpr(i.e, user, spark, ctes), i.alias)),
      from = s.from.map(secureRel(_, user, spark, ctes)),
      where = s.where.map(secureExpr(_, user, spark, ctes)),
      having = s.having.map(secureExpr(_, user, spark, ctes)))
    case SetOpQ(op, all, l, r) =>
      SetOpQ(op, all, secureQuery(l, user, spark, ctes),
        secureQuery(r, user, spark, ctes))
    case WithQ(defs, body) =>
      // each CTE body is secured; the CTE NAMES then shadow base tables
      val securedDefs = defs.map { case (n, cq) =>
        (n, secureQuery(cq, user, spark, ctes)) }
      WithQ(securedDefs, secureQuery(body, user, spark,
        ctes ++ defs.map(_._1.toLowerCase)))
    case v: ValuesQ => v
    case OrderedQ(inner, ob, lim, ties, off) =>
      OrderedQ(secureQuery(inner, user, spark, ctes), ob, lim, ties, off)
  }

  private def secureRel(r: Rel, user: String, spark: SparkSession,
      ctes: Set[String]): Rel = r match {
    case t @ TableRef(Id(parts), alias) =>
      val names = parts.map(_._1)
      if (names.length == 1 && ctes.contains(names.head.toLowerCase)) t
      else {
        val key = keyFor(names)
        // local registrations plus whatever a configured OPA agent defines
        // for this (user, table) — the agent's answers are bounded
        // plan-time metadata calls (reference getRowFilters/getColumnMask
        // are invoked at analysis time the same way)
        val filters = rowFilters.get((user, key)).toSeq ++
          OpaPolicy.rowFilters(user, key).getOrElse(Nil)
        val localMasks = columnMasks.getOrElse((user, key), Map.empty)
        val probeOpaMasks = OpaPolicy.shapesRows
        if (filters.isEmpty && localMasks.isEmpty && !probeOpaMasks) t
        else {
          val cols = columnsOf(spark, names)
          val opaMasks: Map[String, String] =
            if (!probeOpaMasks) Map.empty
            else cols.flatMap(c => OpaPolicy.columnMask(user, key, c)
              .flatten.map(m => c.toLowerCase -> m)).toMap
          val masks = opaMasks ++ localMasks // local wins on conflict
          if (filters.isEmpty && masks.isEmpty) t
          else {
            val items = cols.map { c =>
              masks.get(c.toLowerCase) match {
                case Some(maskSql) =>
                  SelectItem(new SqlParser(maskSql).parseExpr(), Some(c))
                case None => SelectItem(Id(Seq((c, false))), None)
              }
            }
            // several filters (local + agent) compose conjunctively
            val where = filters.map(f => new SqlParser(f).parseExpr())
              .reduceOption((a, b) => Bin("AND", a, b))
            val inner = Select(distinct = false, items,
              Some(TableRef(Id(parts), None)), where, None, None,
              Seq.empty, None, None)
            // keep the original alias (or table name) so qualified column
            // references through the wrapper still resolve
            SubqueryRel(inner, alias.orElse(Some(names.last)), Nil)
          }
        }
      }
    case JoinRel(k, l, rr, on) =>
      JoinRel(k, secureRel(l, user, spark, ctes), secureRel(rr, user, spark, ctes),
        on.map(secureExpr(_, user, spark, ctes)))
    case SubqueryRel(q, a, c) => SubqueryRel(secureQuery(q, user, spark, ctes), a, c)
    case MatchRel(input, block, a) =>
      MatchRel(secureRel(input, user, spark, ctes), block, a)
    case SampleRel(input, m, pct) => SampleRel(secureRel(input, user, spark, ctes), m, pct)
    case other => other // UNNEST/TVF/time travel: no base-table row policy
  }

  /** Expression subqueries (IN/EXISTS/scalar) read tables too. */
  private def secureExpr(e: Expr, user: String, spark: SparkSession,
      ctes: Set[String]): Expr = e match {
    case InSubq(x, sub, n) =>
      InSubq(secureExpr(x, user, spark, ctes), secureQuery(sub, user, spark, ctes), n)
    case ExistsExpr(sub) => ExistsExpr(secureQuery(sub, user, spark, ctes))
    case ScalarSubq(sub) => ScalarSubq(secureQuery(sub, user, spark, ctes))
    case Fn(nm, args, d, over) =>
      Fn(nm, args.map(secureExpr(_, user, spark, ctes)), d, over)
    case Bin(op, l, r) =>
      Bin(op, secureExpr(l, user, spark, ctes), secureExpr(r, user, spark, ctes))
    case Un(op, x) => Un(op, secureExpr(x, user, spark, ctes))
    case Cast(x, t, isTry) => Cast(secureExpr(x, user, spark, ctes), t, isTry)
    case TryExpr(x) => TryExpr(secureExpr(x, user, spark, ctes))
    case IsNull(x, n) => IsNull(secureExpr(x, user, spark, ctes), n)
    case Between(x, lo, hi, n) => Between(secureExpr(x, user, spark, ctes),
      secureExpr(lo, user, spark, ctes), secureExpr(hi, user, spark, ctes), n)
    case InList(x, items, n) => InList(secureExpr(x, user, spark, ctes),
      items.map(secureExpr(_, user, spark, ctes)), n)
    case LikeExpr(x, p, n, esc) => LikeExpr(secureExpr(x, user, spark, ctes),
      secureExpr(p, user, spark, ctes), n, esc.map(secureExpr(_, user, spark, ctes)))
    case CaseExpr(op, whens, els) =>
      CaseExpr(op.map(secureExpr(_, user, spark, ctes)),
        whens.map { case (c, v) =>
          (secureExpr(c, user, spark, ctes), secureExpr(v, user, spark, ctes)) },
        els.map(secureExpr(_, user, spark, ctes)))
    case other => other
  }
}
