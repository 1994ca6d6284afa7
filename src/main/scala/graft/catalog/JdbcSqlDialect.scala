package graft.catalog

/** SQL-generation dialect for the JDBC connector family (reference:
  * plugin/trino-base-jdbc — BaseJdbcClient is subclassed per driver, each
  * subclass overriding identifier quoting, the type map, and how
  * pushed-down expressions render; e.g. the PostgreSQL/MySQL/Oracle
  * clients differ exactly along these axes).
  *
  * The sandbox ships one embedded engine (Derby), so the dialect family is
  * proven by TWO dialects generating DIFFERENT remote SQL — quoted
  * case-sensitive vs unquoted fold-to-upper, different string type maps —
  * against the same engine: the generalization evidence the single
  * hard-wired client could not give. */
trait JdbcSqlDialect {
  def name: String

  /** Render an identifier for remote SQL. */
  def quote(ident: String): String

  /** Physical column name to CREATE (what the remote stores). */
  def columnName(ident: String): String

  /** Remote table name for a logical table. */
  def tableName(base: String): String

  /** `createTableColumnTypes` pins for string columns (the CLOB trap: an
    * unpinned Spark string maps to a type some engines cannot compare). */
  def stringColumnTypes: String

  /** Bounded IN-list lookup for the index join. */
  def inListLookup(table: String, col: String, keys: Seq[Long]): String =
    s"SELECT * FROM ${tableName(table)} WHERE ${quote(col)} IN " +
      s"(${keys.sorted.mkString(", ")})"

  /** MIN/MAX split-bounds metadata query. */
  def boundsQuery(table: String, col: String): String =
    s"SELECT MIN(${quote(col)}), MAX(${quote(col)}) FROM ${tableName(table)}"
}

object JdbcSqlDialect {

  /** Derby-native style: case-sensitive double-quoted lower-case
    * identifiers (what Spark's JDBC writer creates by default). */
  object Quoted extends JdbcSqlDialect {
    val name = "quoted"
    def quote(ident: String): String = "\"" + ident + "\""
    def columnName(ident: String): String = ident
    def tableName(base: String): String = base
    val stringColumnTypes =
      "o_orderstatus VARCHAR(4), o_orderpriority VARCHAR(20)"
  }

  /** ANSI fold-to-upper style (the DB2/Oracle-family behavior): identifiers
    * stored upper-case and referenced UNQUOTED in remote SQL, with a
    * different string type map (CHAR/longer VARCHAR). Same engine, fully
    * different generated SQL. */
  object AnsiUnquoted extends JdbcSqlDialect {
    val name = "ansi-unquoted"
    def quote(ident: String): String = ident.toUpperCase
    def columnName(ident: String): String = ident.toUpperCase
    def tableName(base: String): String = base.toUpperCase + "_ANSI"
    val stringColumnTypes =
      "O_ORDERSTATUS CHAR(4), O_ORDERPRIORITY VARCHAR(32)"
  }

  /** MySQL-family style (reference: plugin/trino-mysql
    * MySqlClient.java — BACKTICK identifier quoting, case-preserved,
    * VARCHAR(n) string map). Derby cannot parse backticks, so this
    * dialect's matrix evidence runs against the loopback wire engine
    * (whose SQL subset accepts backtick quoting, as MySQL and ClickHouse
    * do) — same logical query, third distinct rendering, identical
    * results (DialectMatrixSpec). */
  object BacktickMySql extends JdbcSqlDialect {
    val name = "mysql"
    def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
    def columnName(ident: String): String = ident
    def tableName(base: String): String = base
    val stringColumnTypes =
      "o_orderstatus VARCHAR(4), o_orderpriority VARCHAR(255)"
  }
}
