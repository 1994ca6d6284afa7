package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sqlx.TrinoDialect

/** Queries entering as Trino-dialect SQL TEXT through graft.sqlx.TrinoDialect
  * (SURVEY.md §3 "sqlx/") — the dialect surface itself is the unit under test;
  * each oracle states the same semantics in DuckDB SQL.
  *
  * Reference dialect features exercised: TRY(...) (SqlBase.g4 primaryExpression),
  * format() (reference FormatFunction.java), function-name deltas
  * (approx_distinct/arbitrary/strpos/codepoint), FETCH FIRST, and text-SQL
  * MATCH_RECOGNIZE (SqlBase.g4:446) in both per-match output modes.
  */
object Dialect {

  /** TRY over cast, element_at lookup, and division — Trino's error-absorbing
    * wrapper, lowered onto Spark's try_* family. p_type never has 4 words, so
    * the 4th element_at is an absorbed OOB; p_name never parses as a number;
    * (p_size - 10) hits zero → absorbed division error. */
  def q_sqlx_try(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT p_partkey,
         TRY(CAST(p_name AS DOUBLE)) AS bad_cast,
         TRY(element_at(split(p_type, ' '), 4)) AS oob_elem,
         element_at(split(p_type, ' '), 1) AS first_word,
         TRY(p_retailprice / (p_size - 10)) AS per_size
         FROM part ORDER BY p_partkey""")
  val qSqlxTrySql: String =
    """SELECT p_partkey,
       TRY_CAST(p_name AS DOUBLE) AS bad_cast,
       string_split(p_type, ' ')[4] AS oob_elem,
       string_split(p_type, ' ')[1] AS first_word,
       CASE WHEN p_size = 10 THEN NULL
            ELSE p_retailprice / (p_size - 10) END AS per_size
       FROM part ORDER BY p_partkey"""

  /** format() + renamed scalar functions + FETCH FIRST, all pre-rewritten. */
  def q_sqlx_scalar(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT n_nationkey,
         format('%s#%03d', n_name, n_nationkey) AS tag,
         CAST(strpos(n_name, 'A') AS BIGINT) AS a_pos,
         CAST(codepoint(substring(n_name, 1, 1)) AS BIGINT) AS first_cp
         FROM nation ORDER BY n_nationkey
         FETCH FIRST 20 ROWS ONLY""")
  val qSqlxScalarSql: String =
    """SELECT n_nationkey,
       printf('%s#%03d', n_name, n_nationkey) AS tag,
       strpos(n_name, 'A') AS a_pos,
       CAST(unicode(substr(n_name, 1, 1)) AS BIGINT) AS first_cp
       FROM nation ORDER BY n_nationkey LIMIT 20"""

  /** CROSS JOIN UNNEST + Trino reduce() lambda, pre-rewritten onto
    * LATERAL VIEW explode + aggregate(). */
  def q_sqlx_unnest(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT p_partkey, w AS word,
         CAST(reduce(split(p_type, ' '), 0, (acc, x) -> acc + length(x), acc -> acc) AS BIGINT) AS total_chars
         FROM part CROSS JOIN UNNEST(split(p_type, ' ')) AS t (w)
         ORDER BY p_partkey, word""")
  val qSqlxUnnestSql: String =
    """SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word,
       CAST(list_reduce(list_prepend(0, [length(x) for x in string_split(p_type, ' ')]),
         (acc, x) -> acc + x) AS BIGINT) AS total_chars
       FROM part ORDER BY p_partkey, word"""

  /** Multi-array UNNEST zip WITH ORDINALITY (reference
    * operator/unnest/UnnestOperator.java:45): unequal lengths pad the
    * shorter array with NULL up to the longest. */
  def q_sqlx_unnest_zip(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT CAST(n_nationkey AS BIGINT) AS k,
                CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
                CAST(ord AS BIGINT) AS ord
         FROM nation
         CROSS JOIN UNNEST(
           ARRAY[n_nationkey, n_regionkey, n_nationkey + 100],
           ARRAY[length(n_name), n_regionkey * 2]
         ) WITH ORDINALITY AS t (x, y, ord)
         WHERE n_nationkey < 5
         ORDER BY k, ord""")
  val qSqlxUnnestZipSql: String =
    """WITH base AS (
         SELECT CAST(n_nationkey AS BIGINT) AS k,
                [n_nationkey, n_regionkey, n_nationkey + 100] AS a,
                [length(n_name), n_regionkey * 2] AS b
         FROM nation WHERE n_nationkey < 5)
       SELECT k, CAST(unnest(a) AS BIGINT) AS x, CAST(unnest(b) AS BIGINT) AS y,
              CAST(unnest(generate_series(1, greatest(len(a), len(b)))) AS BIGINT) AS ord
       FROM base ORDER BY k, ord"""

  /** UNNEST over a MAP argument: two output columns (key, value). */
  def q_sqlx_unnest_map(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT CAST(n_nationkey AS BIGINT) AS k, mk,
                CAST(mv AS BIGINT) AS mv
         FROM nation
         CROSS JOIN UNNEST(
           map_from_arrays(ARRAY['n', 'r'], ARRAY[n_nationkey, n_regionkey])
         ) AS t (mk, mv)
         WHERE n_nationkey < 5
         ORDER BY k, mk""")
  val qSqlxUnnestMapSql: String =
    """SELECT k, mk, mv FROM (
         SELECT CAST(n_nationkey AS BIGINT) AS k, 'n' AS mk,
                CAST(n_nationkey AS BIGINT) AS mv
         FROM nation WHERE n_nationkey < 5
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT), 'r',
                CAST(n_regionkey AS BIGINT)
         FROM nation WHERE n_nationkey < 5)
       ORDER BY k, mk"""

  /** Text-SQL MATCH_RECOGNIZE, ONE ROW PER MATCH with measures. */
  def q_sqlx_match_recognize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES FIRST(D.event_id) AS start_id,
                    LAST(U.event_id) AS end_id,
                    COUNT(D.*) AS n_down,
                    COUNT(U.*) AS n_up
           ONE ROW PER MATCH
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (D+ U+)
           DEFINE D AS value < PREV(value),
                  U AS value > PREV(value)
         )""")
      .orderBy($"user_id", $"start_id")
  }
  val qSqlxMatchRecognizeSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       c AS (
         SELECT *, CASE WHEN pv IS NULL THEN 'X' WHEN value < pv THEN 'D'
                        WHEN value > pv THEN 'U' ELSE 'X' END AS cls
         FROM e),
       r AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp
         FROM c),
       runs AS (
         SELECT user_id, cls, min(rn) AS srn,
           count(*) AS len, min(event_id) AS sid, max(event_id) AS eid
         FROM r GROUP BY user_id, cls, grp),
       seq AS (
         SELECT *, lead(cls) OVER w AS ncls, lead(len) OVER w AS nlen,
           lead(eid) OVER w AS neid
         FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY srn))
       SELECT user_id, sid AS start_id, neid AS end_id,
         CAST(len AS BIGINT) AS n_down, CAST(nlen AS BIGINT) AS n_up
       FROM seq WHERE cls = 'D' AND ncls = 'U'
       ORDER BY user_id, start_id"""

  /** Row-pattern recognition in a WINDOW specification (SqlBase.g4:876-880
    * windowSpecification → patternRecognition; runtime operator/window/
    * pattern/ — the one MATCH_RECOGNIZE grammar production beyond the
    * FROM-clause relation): every non-skipped row anchors its own match
    * attempt (INITIAL), measures evaluate FINAL over the match or NULL.
    *
    * Navigation clips at the frame start (r16; pattern-recognition-in-
    * window.md: "the pattern matching can neither match rows nor retrieve
    * input values outside the frame"): PREV at the anchor row reads NULL,
    * so the reference-idiomatic pattern starts with an UNDEFINED anchor
    * symbol A (always true — the doc's own `PATTERN (A B+ C+)` example)
    * and the descending run begins at the NEXT row. A match anchored at
    * the "peak" row consumes [peak, run end] under SKIP PAST LAST ROW;
    * consumed rows show NULL measures; the next peak can never have been
    * consumed (a run's predecessor row is non-descending by maximality). */
  def q_sqlx_match_window(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT user_id, event_id, n_down OVER w AS n_down, end_val OVER w AS end_val
         FROM events
         WINDOW w AS (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES COUNT(D.*) AS n_down, LAST(D.value) AS end_val
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (A D+)
           DEFINE D AS value < PREV(value))""")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchWindowSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, d ORDER BY rn) AS grp
         FROM f),
       runs AS (
         SELECT user_id, grp, min(rn) AS srn, count(*) AS len,
           arg_max(value, rn) AS last_val
         FROM g WHERE d GROUP BY user_id, grp)
       -- a maximal descending run [s, e] yields ONE match anchored at the
       -- peak row s-1 (A) consuming [s-1, e]; all other rows are NULL
       SELECT g.user_id, g.event_id,
         CAST(r.len AS BIGINT) AS n_down, r.last_val AS end_val
       FROM g LEFT JOIN runs r
         ON r.user_id = g.user_id AND r.srn = g.rn + 1
       ORDER BY g.user_id, g.event_id"""

  /** Row-pattern window spec, V-shape (A D+ U+) under AFTER MATCH SKIP TO
    * NEXT ROW: every row anchors its own attempt (no skip marking), so a
    * row matches iff the rows AFTER it descend (the run containing row+1)
    * and that full descending run is immediately followed by an ascending
    * row — strict inequalities make the greedy NFA deterministic (a D row
    * never satisfies U, so backtracking shorter D runs cannot help). The
    * undefined anchor A absorbs the frame-start row where PREV reads NULL
    * (frame-clipped navigation, pattern-recognition-in-window.md). */
  def q_sqlx_match_window2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT user_id, event_id, nd OVER w AS n_down, nu OVER w AS n_up
         FROM events
         WINDOW w AS (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES COUNT(D.*) AS nd, COUNT(U.*) AS nu
           AFTER MATCH SKIP TO NEXT ROW
           PATTERN (A D+ U+)
           DEFINE D AS value < PREV(value), U AS value > PREV(value))""")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchWindow2Sql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       c AS (
         SELECT *, CASE WHEN pv IS NULL THEN 'X' WHEN value < pv THEN 'D'
                        WHEN value > pv THEN 'U' ELSE 'X' END AS cls
         FROM e),
       r AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp
         FROM c),
       runs AS (
         SELECT user_id, cls, grp, min(rn) AS srn, max(rn) AS mx, count(*) AS len
         FROM r GROUP BY user_id, cls, grp),
       seq AS (
         SELECT *, lead(cls) OVER w AS ncls, lead(len) OVER w AS nlen
         FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY srn)),
       dr AS (SELECT * FROM seq WHERE cls = 'D' AND ncls = 'U')
       -- SKIP TO NEXT ROW: a row matches iff the run containing the NEXT
       -- row is descending and immediately followed by an ascending run;
       -- n_down counts from row+1 to the run end, n_up the full U-run
       SELECT r.user_id, r.event_id,
         CASE WHEN dr.srn IS NOT NULL THEN CAST(dr.mx - r.rn AS BIGINT) END AS n_down,
         CASE WHEN dr.srn IS NOT NULL THEN CAST(dr.nlen AS BIGINT) END AS n_up
       FROM r LEFT JOIN dr
         ON dr.user_id = r.user_id AND r.rn + 1 BETWEEN dr.srn AND dr.mx
       ORDER BY r.user_id, r.event_id"""

  /** Bounded row-pattern window frame (SqlBase.g4:879 boundedFrame; r15):
    * `ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING` caps the match search space
    * at 6 rows from the anchor — the NFA cannot match or navigate past the
    * frame end (and, per frame clipping, cannot read below the frame start
    * either: the anchor symbol A is undefined). AFTER MATCH SKIP TO NEXT
    * ROW makes every row its own anchor (no skip marking), so the oracle
    * replays per-row: a row whose successor descends measures the
    * remaining run length from that successor, clipped to the frame. */
  def q_sqlx_match_window3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT user_id, event_id, nd OVER w AS n_down
         FROM events
         WINDOW w AS (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES COUNT(D.*) AS nd
           ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING
           AFTER MATCH SKIP TO NEXT ROW
           PATTERN (A D+)
           DEFINE D AS value < PREV(value))""")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchWindow3Sql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, d ORDER BY rn) AS grp
         FROM f),
       runs AS (
         SELECT user_id, grp, min(rn) AS srn, max(rn) AS mx
         FROM g WHERE d GROUP BY user_id, grp)
       -- frame [rn, rn+5]: D+ runs over rows rn+1.. clipped at rn+5
       SELECT g.user_id, g.event_id,
         CASE WHEN r.mx IS NOT NULL
           THEN CAST(LEAST(r.mx, g.rn + 5) - g.rn AS BIGINT) END AS n_down
       FROM g LEFT JOIN runs r
         ON r.user_id = g.user_id AND g.rn + 1 BETWEEN r.srn AND r.mx
       ORDER BY g.user_id, g.event_id"""

  /** SEEK anchoring in a bounded row-pattern window frame (r15; reference
    * pattern-recognition-in-window.md INITIAL|SEEK): when no match starts
    * at the current row, the engine seeks the first match starting from a
    * subsequent row WITHIN the frame, associating the row with a detached
    * match. Frame-clipped navigation (r16) means D can never match AT the
    * frame start (PREV reads NULL there), so the seek always lands on a
    * subsequent row, where PREV reads the in-frame predecessor. SKIP TO
    * NEXT ROW keeps every row an anchor so the oracle replays windowed:
    * the sought match is the first descending row within [rn+1, rn+3],
    * its measure the run length clipped at the frame end rn+3. */
  def q_sqlx_match_window4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT user_id, event_id, nd OVER w AS n_down
         FROM events
         WINDOW w AS (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES COUNT(D.*) AS nd
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
           AFTER MATCH SKIP TO NEXT ROW
           SEEK
           PATTERN (D+)
           DEFINE D AS value < PREV(value))""")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchWindow4Sql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, d ORDER BY rn) AS grp
         FROM f),
       runs AS (
         SELECT user_id, grp, max(rn) AS mx FROM g WHERE d GROUP BY user_id, grp),
       sought AS (
         SELECT user_id, event_id, rn,
           min(CASE WHEN d THEN rn END) OVER (PARTITION BY user_id ORDER BY rn
             ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS jrn
         FROM g),
       jrow AS (
         SELECT s.user_id, s.event_id, s.rn, s.jrn, g2.grp AS jgrp
         FROM sought s LEFT JOIN g g2
           ON g2.user_id = s.user_id AND g2.rn = s.jrn)
       SELECT j.user_id, j.event_id,
         CASE WHEN j.jrn IS NOT NULL
           THEN CAST(LEAST(r.mx, j.rn + 3) - j.jrn + 1 AS BIGINT) END AS n_down
       FROM jrow j LEFT JOIN runs r
         ON r.user_id = j.user_id AND r.grp = j.jgrp
       ORDER BY j.user_id, j.event_id"""

  /** Multiple named pattern windows + a WINDOW FUNCTION over a pattern
    * window (r15; reference pattern-recognition-in-window.md "upon a window
    * function call over the window": the function evaluates over the frame
    * limited to the matched rows — lowered as a synthesized measure). w1's
    * declared measure counts the descending run after each anchor; w2's
    * `sum(value) OVER w2` sums the three rows of an anchored double-rise
    * match (A U U — the anchor row plus two ascending rows). SKIP TO NEXT
    * ROW on both keeps every row an anchor so the oracle replays with
    * lag/lead windows. */
  def q_sqlx_match_window5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT user_id, event_id, nd OVER w1 AS n_down, sum(value) OVER w2 AS up_sum
         FROM events
         WINDOW w1 AS (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES COUNT(D.*) AS nd
           AFTER MATCH SKIP TO NEXT ROW
           PATTERN (A D+)
           DEFINE D AS value < PREV(value)),
         w2 AS (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES COUNT(U.*) AS nu
           AFTER MATCH SKIP TO NEXT ROW
           PATTERN (A U U)
           DEFINE U AS value > PREV(value))""")
      // double-sum accumulation order differs between engines (DuckDB's
      // windowed aggregates use segment trees) — round at the edge
      .withColumn("up_sum", org.apache.spark.sql.functions.round($"up_sum", 6))
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchWindow5Sql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d,
                   (pv IS NOT NULL AND value > pv) AS u
         FROM e),
       g AS (
         SELECT *,
           lead(u) OVER w AS nxt_u, lead(value) OVER w AS nxt_v,
           lead(u, 2) OVER w AS nxt2_u, lead(value, 2) OVER w AS nxt2_v
         FROM f WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
       h AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, d ORDER BY rn) AS grp
         FROM g),
       runs AS (
         SELECT user_id, grp, min(rn) AS srn, max(rn) AS mx
         FROM h WHERE d GROUP BY user_id, grp)
       SELECT h.user_id, h.event_id,
         CASE WHEN r.mx IS NOT NULL THEN CAST(r.mx - h.rn AS BIGINT) END AS n_down,
         round(CASE WHEN coalesce(h.nxt_u, false) AND coalesce(h.nxt2_u, false)
           THEN h.value + h.nxt_v + h.nxt2_v END, 6) AS up_sum
       FROM h LEFT JOIN runs r
         ON r.user_id = h.user_id AND h.rn + 1 BETWEEN r.srn AND r.mx
       ORDER BY h.user_id, h.event_id"""

  /** PLAIN named window MIXED with a pattern window in one statement (r16;
    * the reference treats a pattern window as an ordinary window
    * specification coexisting with plain ones —
    * pattern-recognition-in-window.md; previously rejected loudly). The
    * pattern measure lowers through the sequential matcher; the plain
    * running sum lowers through Spark's normal window path over the SAME
    * (PARTITION BY, ORDER BY), so EnsureRequirements reuses the single
    * exchange+sort. */
  def q_sqlx_match_window6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT user_id, event_id, nd OVER w1 AS n_down,
                sum(value) OVER w2 AS run_sum
         FROM events
         WINDOW w1 AS (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES COUNT(D.*) AS nd
           AFTER MATCH SKIP TO NEXT ROW
           PATTERN (A D+)
           DEFINE D AS value < PREV(value)),
         w2 AS (
           PARTITION BY user_id
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")
      // running double sum: accumulation order differs between engines
      .withColumn("run_sum", org.apache.spark.sql.functions.round($"run_sum", 6))
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchWindow6Sql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
           sum(value) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_sum
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, d ORDER BY rn) AS grp
         FROM f),
       runs AS (
         SELECT user_id, grp, min(rn) AS srn, max(rn) AS mx
         FROM g WHERE d GROUP BY user_id, grp)
       SELECT g.user_id, g.event_id,
         CASE WHEN r.mx IS NOT NULL THEN CAST(r.mx - g.rn AS BIGINT) END AS n_down,
         round(g.run_sum, 6) AS run_sum
       FROM g LEFT JOIN runs r
         ON r.user_id = g.user_id AND g.rn + 1 BETWEEN r.srn AND r.mx
       ORDER BY g.user_id, g.event_id"""

  /** Text-SQL MATCH_RECOGNIZE, ALL ROWS PER MATCH (classifier + match
    * number). ALL ROWS passes through EVERY input column (r16, reference
    * "remaining columns from the input table") — the select picks the
    * oracle's columns from that full surface. */
  def q_sqlx_match_rows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           ALL ROWS PER MATCH
           PATTERN (D+ U+)
           DEFINE D AS value < PREV(value),
                  U AS value > PREV(value)
         )""")
      .select($"user_id", $"event_id", $"value", $"match_number", $"classifier")
      .orderBy($"user_id", $"event_id")
  }
  // identical semantics to q_match_recognize_rows — same oracle
  val qSqlxMatchRowsSql: String = Patterns.qMatchRecognizeRowsSql

  /** Empty-match semantics, ALL ROWS PER MATCH SHOW EMPTY MATCHES (the
    * default; explicit here) — reference SqlBase.g4:467-476
    * emptyMatchHandling, semantics docs/src/main/sphinx/sql/
    * match-recognize.md "Evaluating expressions in empty matches and
    * unmatched rows". PATTERN (D*) is empty-capable: every row either
    * extends a maximal descending run (one non-empty match per run, greedy
    * D* + SKIP PAST LAST ROW) or starts an EMPTY match. An empty match
    * emits ONE row — the starting row's input values, NULL classifier, a
    * sequential MATCH_NUMBER like any match, and aggregates over the empty
    * row set (COUNT = 0). */
  def q_sqlx_match_empty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls, COUNT(D.*) AS n_down
           ALL ROWS PER MATCH SHOW EMPTY MATCHES
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (D*)
           DEFINE D AS value < PREV(value)
         )""")
      .select($"user_id", $"event_id", $"mn", $"cls", $"n_down")
      .orderBy($"user_id", $"event_id")
  }
  /** Oracle replay: d-runs are the non-empty matches; every other row is an
    * empty match. A match STARTS where a d-run begins or at any non-d row,
    * so MATCH_NUMBER is the running count of starts; RUNNING COUNT(D.*) is
    * the row's position within its run (0 on empty-match rows). */
  val qSqlxMatchEmptySql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, CASE WHEN NOT d OR NOT coalesce(
             lag(d) OVER (PARTITION BY user_id ORDER BY event_id), FALSE)
           THEN 1 ELSE 0 END AS st
         FROM f),
       h AS (
         SELECT *, sum(st) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS mn
         FROM g)
       SELECT user_id, event_id, CAST(mn AS BIGINT) AS mn,
         CASE WHEN d THEN 'D' END AS cls,
         CAST(CASE WHEN d THEN row_number() OVER (
           PARTITION BY user_id, mn ORDER BY event_id) ELSE 0 END AS BIGINT) AS n_down
       FROM h
       ORDER BY user_id, event_id"""

  /** ALL ROWS PER MATCH OMIT EMPTY MATCHES: empty matches produce no output
    * rows but STILL consume sequential match numbers — the mn gaps on the
    * surviving rows pin that semantic (same reference citations as
    * q_sqlx_match_empty). */
  def q_sqlx_match_empty_omit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES MATCH_NUMBER() AS mn, COUNT(D.*) AS n_down
           ALL ROWS PER MATCH OMIT EMPTY MATCHES
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (D*)
           DEFINE D AS value < PREV(value)
         )""")
      .select($"user_id", $"event_id", $"mn", $"n_down")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchEmptyOmitSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, CASE WHEN NOT d OR NOT coalesce(
             lag(d) OVER (PARTITION BY user_id ORDER BY event_id), FALSE)
           THEN 1 ELSE 0 END AS st
         FROM f),
       h AS (
         SELECT *, sum(st) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS mn
         FROM g)
       SELECT user_id, event_id, CAST(mn AS BIGINT) AS mn,
         CAST(row_number() OVER (
           PARTITION BY user_id, mn ORDER BY event_id) AS BIGINT) AS n_down
       FROM h WHERE d
       ORDER BY user_id, event_id"""

  /** QUANTIFIED empty group (r17; reference SqlBase.g4 composes the empty
    * pattern `()` with every patternQuantifier): `(D | ()){1,2}` matches up
    * to two descending rows greedily, and where D fails the zero-width
    * branch completes the quantifier as an EMPTY match — the r16 divergence
    * was failing such patterns outright. Replay: d-runs chunk into pairs
    * (greedy {1,2} + SKIP PAST LAST ROW), every non-d row is an empty
    * match; RUNNING COUNT(D.*) is the 1-based position within the chunk. */
  def q_sqlx_match_empty_quant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls, COUNT(D.*) AS n_down
           ALL ROWS PER MATCH SHOW EMPTY MATCHES
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN ((D | ()){1,2})
           DEFINE D AS value < PREV(value)
         )""")
      .select($"user_id", $"event_id", $"mn", $"cls", $"n_down")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchEmptyQuantSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, CASE WHEN d AND NOT coalesce(
             lag(d) OVER (PARTITION BY user_id ORDER BY event_id), FALSE)
           THEN 1 ELSE 0 END AS run_st
         FROM f),
       h AS (
         SELECT *, sum(run_st) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS run_id
         FROM g),
       r AS (
         SELECT *, CASE WHEN d THEN row_number() OVER (
           PARTITION BY user_id, run_id, d ORDER BY event_id) END AS rn
         FROM h),
       st AS (
         SELECT *, CASE WHEN NOT d OR (rn - 1) % 2 = 0 THEN 1 ELSE 0 END AS mst
         FROM r)
       SELECT user_id, event_id,
         CAST(sum(mst) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mn,
         CASE WHEN d THEN 'D' END AS cls,
         CAST(CASE WHEN d THEN (rn - 1) % 2 + 1 ELSE 0 END AS BIGINT) AS n_down
       FROM st
       ORDER BY user_id, event_id"""

  /** ONE ROW PER MATCH over an empty-capable pattern: the reference EMITS a
    * row for every empty match (match-recognize.md "The output is also
    * produced for empty matches, based on their starting rows") — column
    * references and navigation NULL, COUNT 0, MATCH_NUMBER sequential. This
    * was r15's untested wrong-answer mode (empty matches were discarded). */
  def q_sqlx_match_empty_one(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES MATCH_NUMBER() AS mn, FIRST(D.event_id) AS sid, COUNT(D.*) AS n_down
           ONE ROW PER MATCH
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (D*)
           DEFINE D AS value < PREV(value)
         )""")
      .select($"user_id", $"mn", $"sid", $"n_down")
      .orderBy($"user_id", $"mn")
  }
  val qSqlxMatchEmptyOneSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, CASE WHEN NOT d OR NOT coalesce(
             lag(d) OVER (PARTITION BY user_id ORDER BY event_id), FALSE)
           THEN 1 ELSE 0 END AS st
         FROM f),
       h AS (
         SELECT *, sum(st) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS mn
         FROM g)
       SELECT user_id, CAST(mn AS BIGINT) AS mn,
         min(event_id) FILTER (WHERE d) AS sid,
         CAST(count(*) FILTER (WHERE d) AS BIGINT) AS n_down
       FROM h GROUP BY user_id, mn
       ORDER BY user_id, mn"""

  /** Bounded quantifier `D{2,3}` (reference SqlBase.g4:921
    * patternQuantifier rangeQuantifier): greedy pieces of 3 descending
    * rows per maximal run, a trailing 2-piece when the remainder allows,
    * a 1-row remainder unconsumed — the sequential SKIP PAST LAST ROW
    * piece arithmetic the oracle replays in closed form. */
  def q_sqlx_match_quant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES MATCH_NUMBER() AS mn, FIRST(D.event_id) AS sid, COUNT(D.*) AS nd
           ONE ROW PER MATCH
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (D{2,3})
           DEFINE D AS value < PREV(value)
         )""")
      .select($"user_id", $"mn", $"sid", $"nd")
      .orderBy($"user_id", $"mn")
  }
  val qSqlxMatchQuantSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e),
       g AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, d ORDER BY rn) AS grp
         FROM f),
       runs AS (
         SELECT user_id, grp, min(rn) AS srn, count(*) AS len
         FROM g WHERE d GROUP BY user_id, grp),
       pieces AS (
         SELECT r.user_id, r.srn + 3 * i.range AS prn,
           CASE WHEN r.len - 3 * i.range >= 3 THEN 3 ELSE 2 END AS nd
         FROM runs r CROSS JOIN range(200) i
         WHERE 3 * i.range + 2 <= r.len),
       numbered AS (
         SELECT user_id, prn, nd,
           row_number() OVER (PARTITION BY user_id ORDER BY prn) AS mn
         FROM pieces)
       SELECT n.user_id, CAST(n.mn AS BIGINT) AS mn, g.event_id AS sid,
         CAST(n.nd AS BIGINT) AS nd
       FROM numbered n JOIN g ON g.user_id = n.user_id AND g.rn = n.prn
       ORDER BY n.user_id, mn"""

  /** RELUCTANT quantifier `E{0,2}?` (SqlBase.g4:921 reluctant =
    * QUESTION_MARK): prefers FEWER repetitions, so `E E{0,2}?` matches
    * exactly ONE row per attempt where the greedy form would take three —
    * every row becomes its own match. */
  def q_sqlx_match_reluctant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES MATCH_NUMBER() AS mn, FIRST(E.event_id) AS sid, COUNT(E.*) AS ne
           ONE ROW PER MATCH
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (E E{0,2}?)
           DEFINE E AS event_id >= 0
         )""")
      .select($"user_id", $"mn", $"sid", $"ne")
      .orderBy($"user_id", $"mn")
  }
  val qSqlxMatchReluctantSql: String =
    """SELECT user_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS mn,
         event_id AS sid, CAST(1 AS BIGINT) AS ne
       FROM events
       ORDER BY user_id, mn"""

  /** Partition anchors `^` and `$` (SqlBase.g4:916-917): `^ E E` matches
    * only at the partition start (one 2-row match per user); `E{1,3}? $`
    * pins the partition END — the only attempt that can succeed is three
    * rows before the end, consuming exactly the tail. Both in one oracle
    * via a UNION of the two MATCH_RECOGNIZE runs. */
  def q_sqlx_match_anchors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val head = TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES FIRST(E.event_id) AS sid, LAST(E.event_id) AS eid, COUNT(E.*) AS ne
           ONE ROW PER MATCH
           PATTERN (^ E E)
           DEFINE E AS event_id >= 0
         )""").select($"user_id", org.apache.spark.sql.functions.lit("head").as("part"),
      $"sid", $"eid", $"ne")
    val tail = TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES FIRST(E.event_id) AS sid, LAST(E.event_id) AS eid, COUNT(E.*) AS ne
           ONE ROW PER MATCH
           PATTERN (E{1,3}? $)
           DEFINE E AS event_id >= 0
         )""").select($"user_id", org.apache.spark.sql.functions.lit("tail").as("part"),
      $"sid", $"eid", $"ne")
    head.unionAll(tail).orderBy($"user_id", $"part")
  }
  val qSqlxMatchAnchorsSql: String =
    """WITH e AS (
         SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS cnt
         FROM events)
       SELECT user_id, 'head' AS part,
         min(CASE WHEN rn = 1 THEN event_id END) AS sid,
         min(CASE WHEN rn = 2 THEN event_id END) AS eid,
         CAST(2 AS BIGINT) AS ne
       FROM e GROUP BY user_id
       UNION ALL
       SELECT user_id, 'tail',
         min(CASE WHEN rn = cnt - 2 THEN event_id END),
         min(CASE WHEN rn = cnt THEN event_id END),
         CAST(3 AS BIGINT)
       FROM e GROUP BY user_id
       ORDER BY user_id, part"""

  /** ALL ROWS PER MATCH WITH UNMATCHED ROWS on a non-empty-capable pattern
    * (PATTERN (D) — single descending row): unmatched rows (no non-empty
    * match, no empty match possible) each emit one row with ALL measures
    * NULL including MATCH_NUMBER — the documented way to tell them from
    * empty matches, which keep their number. With SKIP PAST LAST ROW this
    * is the one configuration guaranteeing exactly one output row per input
    * row (match-recognize.md "After match skip"). */
  def q_sqlx_match_unmatched(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls, LAST(D.value) AS dv
           ALL ROWS PER MATCH WITH UNMATCHED ROWS
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (D)
           DEFINE D AS value < PREV(value)
         )""")
      .select($"user_id", $"event_id", $"mn", $"cls", $"dv")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchUnmatchedSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
         FROM events),
       f AS (
         SELECT *, (pv IS NOT NULL AND value < pv) AS d FROM e)
       SELECT user_id, event_id,
         CASE WHEN d THEN CAST(sum(CASE WHEN d THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) END AS mn,
         CASE WHEN d THEN 'D' END AS cls,
         CASE WHEN d THEN value END AS dv
       FROM f
       ORDER BY user_id, event_id"""

  /** MATCH_RECOGNIZE with a MULTI-COLUMN partition key — the V-shape pattern
    * per (user_id, event_type) stream. Exercises the generalized group runner
    * (any-type multi-column keys) and measure lowering onto Catalyst windows. */
  def q_sqlx_match_multikey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id, event_type
           ORDER BY event_id
           MEASURES FIRST(D.event_id) AS start_id,
                    LAST(U.event_id) AS end_id,
                    COUNT(D.*) AS n_down,
                    COUNT(U.*) AS n_up
           ONE ROW PER MATCH
           AFTER MATCH SKIP PAST LAST ROW
           PATTERN (D+ U+)
           DEFINE D AS value < PREV(value),
                  U AS value > PREV(value)
         )""")
      .orderBy($"user_id", $"event_type", $"start_id")
  }
  val qSqlxMatchMultikeySql: String =
    """WITH e AS (
         SELECT user_id, event_type, event_id, value,
           lag(value) OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
         FROM events),
       c AS (
         SELECT *, CASE WHEN pv IS NULL THEN 'X' WHEN value < pv THEN 'D'
                        WHEN value > pv THEN 'U' ELSE 'X' END AS cls
         FROM e),
       r AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type, cls ORDER BY rn) AS grp
         FROM c),
       runs AS (
         SELECT user_id, event_type, cls, min(rn) AS srn,
           count(*) AS len, min(event_id) AS sid, max(event_id) AS eid
         FROM r GROUP BY user_id, event_type, cls, grp),
       seq AS (
         SELECT *, lead(cls) OVER w AS ncls, lead(len) OVER w AS nlen,
           lead(eid) OVER w AS neid
         FROM runs WINDOW w AS (PARTITION BY user_id, event_type ORDER BY srn))
       SELECT user_id, event_type, sid AS start_id, neid AS end_id,
         CAST(len AS BIGINT) AS n_down, CAST(nlen AS BIGINT) AS n_up
       FROM seq WHERE cls = 'D' AND ncls = 'U'
       ORDER BY user_id, event_type, start_id"""

  /** MATCH_RECOGNIZE with an arbitrary-EXPRESSION DEFINE (beyond the old
    * `col op PREV(col)` regex subset) plus RUNNING/FINAL measures over a
    * pattern variable — DEFINE lowers to a codegen'd boolean lag() column,
    * measures to Catalyst window expressions over (key, match_number). */
  /** AFTER MATCH SKIP TO LAST <var> (round-8 closure of the skip-mode
    * subset): with an all-true 3-row pattern, resuming AT the last Z row
    * yields stride-2 OVERLAPPING triples — distinguishable from both SKIP
    * PAST LAST ROW (stride 3) and SKIP TO NEXT ROW (stride 1), so the
    * oracle pins the skip-to-variable semantics specifically. */
  def q_sqlx_match_skip_to(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES FIRST(X.event_id) AS m_start, LAST(Z.event_id) AS m_end
           ONE ROW PER MATCH
           AFTER MATCH SKIP TO LAST Z
           PATTERN (X Y Z)
           DEFINE X AS event_id >= 0, Y AS event_id >= 0, Z AS event_id >= 0
         )""")
      .orderBy($"user_id", $"m_start")
  }
  val qSqlxMatchSkipToSql: String =
    """WITH numbered AS (
         SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events)
       SELECT a.user_id AS user_id, a.event_id AS m_start, c.event_id AS m_end
       FROM numbered a JOIN numbered c
         ON a.user_id = c.user_id AND c.rn = a.rn + 2
       WHERE a.rn % 2 = 1
       ORDER BY a.user_id, m_start"""

  def q_sqlx_match_define_expr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES RUNNING COUNT(*) AS run_len,
                    FINAL COUNT(S.*) AS match_len,
                    FINAL MAX(S.value) AS match_max,
                    FINAL FIRST(S.value) AS first_val
           ALL ROWS PER MATCH
           PATTERN (S+)
           DEFINE S AS value > PREV(value) * 1.02 OR value < 5.0
         )""")
      // ALL ROWS passes through every input column (r16) — pick the
      // oracle's columns from the full surface
      .select($"user_id", $"event_id", $"value", $"match_number",
        $"classifier", $"run_len", $"match_len", $"match_max", $"first_val")
      .orderBy($"user_id", $"event_id")
  }
  val qSqlxMatchDefineExprSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
         FROM e WHERE value > pv * 1.02 OR value < 5.0),
       m AS (
         SELECT user_id, event_id, value,
           dense_rank() OVER (PARTITION BY user_id ORDER BY grp) AS match_number,
           row_number() OVER (PARTITION BY user_id, grp ORDER BY rn) AS run_len,
           count(*) OVER (PARTITION BY user_id, grp) AS match_len,
           max(value) OVER (PARTITION BY user_id, grp) AS match_max,
           first_value(value) OVER (PARTITION BY user_id, grp ORDER BY rn) AS first_val
         FROM f)
       SELECT user_id, event_id, value,
         CAST(match_number AS BIGINT) AS match_number, 'S' AS classifier,
         CAST(run_len AS BIGINT) AS run_len, CAST(match_len AS BIGINT) AS match_len,
         match_max, first_val
       FROM m ORDER BY user_id, event_id"""

  /** Match-state-dependent DEFINE #1 — COUNT(B.*) bounds the match length
    * (reference DEFINE semantics: the candidate row is tentatively mapped,
    * so the count includes it; operator/window/matcher/Matcher.java). Runs
    * of value > 50 are chunked into matches of at most 4 rows; the oracle
    * replays the chunking with gaps-islands + integer division, which is
    * exact because the count resets deterministically every 4 rows. */
  def q_sqlx_match_count_define(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES FIRST(B.event_id) AS start_id,
                    LAST(B.event_id) AS end_id,
                    COUNT(B.*) AS n
           ONE ROW PER MATCH
           PATTERN (B+)
           DEFINE B AS value > 50 AND COUNT(B.*) <= 4
         )""")
      .orderBy($"user_id", $"start_id")
  }
  val qSqlxMatchCountDefineSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
         FROM e WHERE value > 50),
       c AS (
         SELECT *, CAST(floor((row_number() OVER (PARTITION BY user_id, grp ORDER BY rn) - 1) / 4) AS BIGINT) AS chunk
         FROM f)
       SELECT user_id, min(event_id) AS start_id, max(event_id) AS end_id,
         CAST(count(*) AS BIGINT) AS n
       FROM c GROUP BY user_id, grp, chunk
       ORDER BY user_id, start_id"""

  /** MEASURES occurrence offsets (closing the former "measures do not
    * parse occurrence offsets" limit): FIRST(B.x, 1) / LAST(B.x, 1)
    * navigate to the second / second-from-last row matched to B;
    * out-of-range navigation is NULL (rewritten onto ordered value lists
    * with null-safe `get`, sqlx.MatchRecognizeSql.measureNav). */
  def q_sqlx_match_measure_offset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES FIRST(B.event_id) AS start_id,
                    FIRST(B.event_id, 1) AS second_id,
                    LAST(B.event_id, 1) AS second_last_id,
                    COUNT(B.*) AS n
           ONE ROW PER MATCH
           PATTERN (B+)
           DEFINE B AS value > 50 AND COUNT(B.*) <= 4
         )""")
      .orderBy($"user_id", $"start_id")
  }
  val qSqlxMatchMeasureOffsetSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       f AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
         FROM e WHERE value > 50),
       c AS (
         SELECT *, CAST(floor((row_number() OVER (PARTITION BY user_id, grp ORDER BY rn) - 1) / 4) AS BIGINT) AS chunk
         FROM f),
       m AS (
         SELECT user_id, list(event_id ORDER BY rn) AS ids, count(*) AS cnt
         FROM c GROUP BY user_id, grp, chunk)
       SELECT user_id,
         CAST(ids[1] AS BIGINT) AS start_id,
         CAST(ids[2] AS BIGINT) AS second_id,
         CAST(ids[CAST(cnt AS INT) - 1] AS BIGINT) AS second_last_id,
         CAST(cnt AS BIGINT) AS n
       FROM m ORDER BY user_id, start_id"""

  /** Match-state-dependent DEFINE #2 — cross-variable reference: B's
    * condition navigates the anchor row's value (bare A.value ≡
    * LAST(A.value) per the standard). Each row ≥ 100 anchors a match whose
    * followers stay within an anchor-relative band; followers are < 100 so
    * anchors are never consumed as B, making matches independent per anchor
    * — which is what lets a DuckDB join replay them exactly. */
  def q_sqlx_match_anchor_define(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM events MATCH_RECOGNIZE (
           PARTITION BY user_id
           ORDER BY event_id
           MEASURES A.event_id AS anchor_id,
                    A.value AS anchor_val,
                    COUNT(B.*) AS n_follow,
                    COUNT(*) AS n_rows
           ONE ROW PER MATCH
           PATTERN (A B*)
           DEFINE A AS value >= 100,
                  B AS value < 100 AND value > A.value - 80
         )""")
      .orderBy($"user_id", $"anchor_id")
  }
  val qSqlxMatchAnchorDefineSql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events),
       mx AS (SELECT user_id, max(rn) AS maxrn FROM e GROUP BY user_id),
       a AS (SELECT * FROM e WHERE value >= 100),
       v AS (
         SELECT a.user_id, a.rn AS arn,
           min(CASE WHEN NOT (f.value < 100 AND f.value > a.value - 80) THEN f.rn END) AS vrn
         FROM a JOIN e f ON f.user_id = a.user_id AND f.rn > a.rn
         GROUP BY a.user_id, a.rn),
       n AS (
         SELECT a.user_id, a.event_id AS anchor_id, a.value AS anchor_val,
           coalesce(v.vrn, mx.maxrn + 1) - a.rn - 1 AS n_follow
         FROM a
         LEFT JOIN v ON v.user_id = a.user_id AND v.arn = a.rn
         JOIN mx ON mx.user_id = a.user_id)
       SELECT user_id, anchor_id, anchor_val,
         CAST(n_follow AS BIGINT) AS n_follow,
         CAST(n_follow + 1 AS BIGINT) AS n_rows
       FROM n ORDER BY user_id, anchor_id"""

  /** FETCH FIRST n ROWS WITH TIES (reference SqlBase.g4 limitRowCount):
    * lowered onto rank() over the trailing ORDER BY; the oracle runs DuckDB's
    * NATIVE WITH TIES. Ordering on o_orderpriority (5 distinct values over
    * thousands of rows) makes the tie-extension the whole point: the result
    * is every row of the best priority class, not 10 rows. */
  def q_sqlx_fetch_ties(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT o_orderkey, o_orderpriority FROM orders
         WHERE o_orderkey <= 2000
         ORDER BY o_orderpriority
         FETCH FIRST 10 ROWS WITH TIES""")
      .orderBy($"o_orderpriority", $"o_orderkey")
  }
  // DuckDB has no WITH TIES — the oracle states its standard definition
  // (rows whose rank under the ORDER BY is within the fetch count)
  val qSqlxFetchTiesSql: String =
    """SELECT o_orderkey, o_orderpriority FROM (
         SELECT o_orderkey, o_orderpriority,
           rank() OVER (ORDER BY o_orderpriority) AS r
         FROM orders WHERE o_orderkey <= 2000)
       WHERE r <= 10 ORDER BY o_orderpriority, o_orderkey"""

  /** AT TIME ZONE (reference SqlBase.g4 valueExpression): instant-preserving
    * display-zone change, rewritten onto from_utc_timestamp (session zone is
    * UTC). DuckDB's ICU timezone() is the oracle. */
  def q_sqlx_at_timezone(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT event_id,
         date_format(ts AT TIME ZONE 'Asia/Tokyo', 'yyyy-MM-dd HH:mm:ss') AS tokyo,
         date_format(ts AT TIME ZONE 'America/New_York', 'yyyy-MM-dd HH:mm:ss') AS ny
         FROM events WHERE event_id < 2000 ORDER BY event_id""")
  }
  val qSqlxAtTimezoneSql: String =
    """SELECT event_id,
       strftime(timezone('Asia/Tokyo', ts::TIMESTAMPTZ), '%Y-%m-%d %H:%M:%S') AS tokyo,
       strftime(timezone('America/New_York', ts::TIMESTAMPTZ), '%Y-%m-%d %H:%M:%S') AS ny
       FROM events WHERE event_id < 2000 ORDER BY event_id"""

  /** PREPARE / EXECUTE … USING (reference execution/PrepareTask.java,
    * grammar EXECUTE): parameter markers bound literal-aware (a '?' inside a
    * string literal survives), statements registered per session. */
  def q_sqlx_prepare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """PREPARE top_orders FROM
         SELECT o_orderkey, o_orderpriority, concat(o_orderstatus, '?') AS tagged
         FROM orders WHERE o_orderkey <= ? AND o_totalprice > ?
         ORDER BY o_orderkey""")
    TrinoDialect.sql(s, dir, "EXECUTE top_orders USING 5000, 150000.0")
  }
  val qSqlxPrepareSql: String =
    """SELECT o_orderkey, o_orderpriority, o_orderstatus || '?' AS tagged
       FROM orders WHERE o_orderkey <= 5000 AND o_totalprice > 150000.0
       ORDER BY o_orderkey"""

  /** SQL routine DDL (reference execution/CreateFunctionTask.java,
    * sql/routine/SqlRoutineCompiler.java): CREATE FUNCTION with routine
    * characteristics, body going through the dialect rewriter (format/strpos
    * are reference names), then a query calling both routines — which Spark
    * inlines and codegen-compiles, the same end state as the reference's
    * bytecode routine compiler. */
  def q_sqlx_create_function(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      "CREATE FUNCTION add_tax(price double, rate double) RETURNS double " +
        "DETERMINISTIC RETURN price * (1.0 + rate)")
    TrinoDialect.sql(s, dir,
      "CREATE OR REPLACE FUNCTION part_label(s varchar, n bigint) RETURNS varchar " +
        "LANGUAGE SQL RETURN format('%s@%d', substring(s, 1, strpos(s, ' ') - 1), n)")
    TrinoDialect.sql(s, dir,
      """SELECT p_partkey,
         add_tax(p_retailprice, 0.08) AS taxed,
         part_label(p_type, p_partkey) AS label
         FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""")
  }
  val qSqlxCreateFunctionSql: String =
    """SELECT p_partkey,
       p_retailprice * (1.0 + 0.08) AS taxed,
       printf('%s@%d', substring(p_type, 1, strpos(p_type, ' ') - 1), p_partkey) AS label
       FROM part WHERE p_partkey <= 200 ORDER BY p_partkey"""

  /** LISTAGG with the full reference grammar (SqlBase.g4:637-441): DISTINCT,
    * separator, ON OVERFLOW TRUNCATE … WITH COUNT (parsed; moot in Spark —
    * no 1MB varchar ceiling), WITHIN GROUP ordering. Lowered onto Spark
    * 4.1's native listagg (SupportsOrderingWithinGroup). DuckDB replays via
    * string_agg(… ORDER BY …). */
  def q_sqlx_listagg(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """SELECT n_regionkey,
           LISTAGG(n_name, '|' ON OVERFLOW TRUNCATE '...' WITH COUNT)
             WITHIN GROUP (ORDER BY n_name) AS names,
           LISTAGG(DISTINCT o_orderpriority, ',')
             WITHIN GROUP (ORDER BY o_orderpriority) AS prios
         FROM nation
         JOIN orders ON o_custkey % 25 = n_nationkey
         WHERE o_orderkey <= 2000
         GROUP BY n_regionkey
         ORDER BY n_regionkey""")
  }
  val qSqlxListaggSql: String =
    """SELECT n_regionkey,
       string_agg(n_name, '|' ORDER BY n_name) AS names,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
       FROM nation
       JOIN orders ON o_custkey % 25 = n_nationkey
       WHERE o_orderkey <= 2000
       GROUP BY n_regionkey
       ORDER BY n_regionkey"""

  /** Procedural routine body with a WHILE loop (reference SqlBase.g4:995
    * controlStatement, sql/routine/SqlRoutineCompiler.java): DECLARE frame,
    * iterative fibonacci, assignments casting to the declared type. The
    * loop tier pre-binds every scalar expression to the variable frame at
    * CREATE time (Catalyst analyze+bind once) and only interprets the
    * control flow per row. The DuckDB oracle replays the recurrence with a
    * recursive CTE. */
  def q_sqlx_routine_loop(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE FUNCTION fib(n bigint) RETURNS bigint
         DETERMINISTIC
         BEGIN
           DECLARE a bigint DEFAULT 0;
           DECLARE b bigint DEFAULT 1;
           DECLARE t bigint;
           DECLARE i bigint DEFAULT 0;
           WHILE i < n DO
             SET t = a + b;
             SET a = b;
             SET b = t;
             SET i = i + 1;
           END WHILE;
           RETURN a;
         END""")
    TrinoDialect.sql(s, dir,
      "SELECT n_nationkey, fib(n_nationkey) AS fib FROM nation ORDER BY n_nationkey")
  }
  val qSqlxRoutineLoopSql: String =
    """WITH RECURSIVE f(i, a, b) AS (
         SELECT 0, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
         UNION ALL SELECT i + 1, b, a + b FROM f WHERE i < 24)
       SELECT n.n_nationkey, f.a AS fib FROM nation n JOIN f ON f.i = n.n_nationkey
       ORDER BY n.n_nationkey"""

  /** LOOP / LEAVE / ITERATE with labels plus IF/ELSEIF inside the loop
    * (SqlBase.g4:1000-1004): collatz step count. ITERATE restarts the
    * labeled loop, LEAVE exits it. The oracle replays the trajectory with a
    * recursive CTE over the distinct argument domain. */
  def q_sqlx_routine_collatz(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE FUNCTION collatz_steps(n bigint) RETURNS bigint
         BEGIN
           DECLARE v bigint;
           DECLARE s bigint DEFAULT 0;
           SET v = n;
           walk: LOOP
             IF v <= 1 THEN
               LEAVE walk;
             END IF;
             SET s = s + 1;
             IF v % 2 = 0 THEN
               SET v = v / 2;
               ITERATE walk;
             END IF;
             SET v = 3 * v + 1;
           END LOOP;
           RETURN s;
         END""")
    TrinoDialect.sql(s, dir,
      """SELECT c_custkey, collatz_steps(c_custkey % 89 + 1) AS steps
         FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey""")
  }
  val qSqlxRoutineCollatzSql: String =
    """WITH RECURSIVE c(start, v, s) AS (
         SELECT d, d, CAST(0 AS BIGINT)
         FROM (SELECT DISTINCT c_custkey % 89 + 1 AS d FROM customer WHERE c_custkey <= 300)
         UNION ALL
         SELECT start, CASE WHEN v % 2 = 0 THEN v // 2 ELSE 3 * v + 1 END, s + 1
         FROM c WHERE v > 1)
       SELECT cu.c_custkey, m.ms AS steps
       FROM customer cu
       JOIN (SELECT start, CAST(max(s) AS BIGINT) AS ms FROM c GROUP BY start) m
         ON m.start = cu.c_custkey % 89 + 1
       WHERE cu.c_custkey <= 300 ORDER BY cu.c_custkey"""

  /** Loop-free procedural body — compound frame, IF/ELSEIF, simple CASE
    * statement — compiled by RoutineLang's continuation-passing pass into
    * ONE Catalyst expression and registered as a native Spark SQL UDF, so
    * the call site inlines into whole-stage codegen (RoutineSpec asserts
    * no ScalaUDF node survives in the optimized plan). */
  def q_sqlx_routine_compound(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE FUNCTION order_tier(price double, status varchar) RETURNS varchar
         BEGIN
           DECLARE t varchar DEFAULT 'small';
           IF price >= 200000 THEN
             SET t = 'jumbo';
           ELSEIF price >= 100000 THEN
             SET t = 'large';
           ELSEIF price >= 50000 THEN
             SET t = 'medium';
           END IF;
           CASE status
             WHEN 'F' THEN RETURN t || ':closed';
             WHEN 'O' THEN RETURN t || ':open';
           END CASE;
           RETURN t || ':other';
         END""")
    TrinoDialect.sql(s, dir,
      """SELECT o_orderkey, order_tier(o_totalprice, o_orderstatus) AS tier
         FROM orders WHERE o_orderkey <= 4000 ORDER BY o_orderkey""")
  }
  val qSqlxRoutineCompoundSql: String =
    """SELECT o_orderkey,
       (CASE WHEN o_totalprice >= 200000 THEN 'jumbo'
             WHEN o_totalprice >= 100000 THEN 'large'
             WHEN o_totalprice >= 50000 THEN 'medium'
             ELSE 'small' END) ||
       (CASE o_orderstatus WHEN 'F' THEN ':closed' WHEN 'O' THEN ':open'
             ELSE ':other' END) AS tier
       FROM orders WHERE o_orderkey <= 4000 ORDER BY o_orderkey"""

  /** LANGUAGE PYTHON functions (reference plugin/trino-functions-python,
    * TestPythonFunctions.java): a durable CREATE FUNCTION and an inline
    * WITH FUNCTION, both $$-bodied, executed by PythonFunctions' persistent
    * python3 worker subprocesses (one per executor thread, row protocol =
    * newline JSON). The arithmetic is pure IEEE-double on both sides so the
    * DuckDB oracle hashes identically. */
  def q_sqlx_python_udf(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      "CREATE FUNCTION py_tag(status varchar, k bigint) RETURNS varchar " +
        "LANGUAGE PYTHON WITH (handler = 'tag') AS $$\n" +
        "def tag(status, k):\n" +
        "    return '%s#%d' % (status, k * 2)\n" +
        "$$")
    TrinoDialect.sql(s, dir,
      """WITH FUNCTION py_margin(price double, disc double)
         RETURNS double
         LANGUAGE PYTHON
         WITH (handler = 'margin')
         AS $$
         def margin(price, disc):
             return price * (1.0 - disc)
         $$
         SELECT l_orderkey, py_margin(l_extendedprice, l_discount) AS margin,
                py_tag(l_returnflag, l_orderkey) AS tag
         FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, margin""")
  }
  val qSqlxPythonUdfSql: String =
    """SELECT l_orderkey, l_extendedprice * (1.0 - l_discount) AS margin,
       l_returnflag || '#' || CAST(l_orderkey * 2 AS VARCHAR) AS tag
       FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, margin"""

  /** TRY over a WINDOW expression — the nesting the regex layer could not
    * place (VERDICT r6 item 3): the parser lowers the arithmetic AROUND the
    * window call, producing try_divide(sum(...) OVER w, ...). The window sum
    * runs in exact decimals; the denominator is 0 or 1, so the division is
    * either exact or the absorbed DIVISION_BY_ZERO → NULL. */
  def q_sqlx_try_window(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT event_id,
         CAST(sum(CAST(value AS DECIMAL(12,2)))
              OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running,
         CAST(TRY(sum(CAST(value AS DECIMAL(12,2)))
              OVER (PARTITION BY user_id ORDER BY event_id) / (event_id % 2)) AS DOUBLE) AS ratio
         FROM events WHERE event_id < 3000 ORDER BY event_id""")
  val qSqlxTryWindowSql: String =
    """SELECT event_id,
       CAST(sum(CAST(value AS DECIMAL(12,2)))
            OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running,
       CASE WHEN event_id % 2 = 0 THEN NULL
            ELSE CAST(sum(CAST(value AS DECIMAL(12,2)))
                 OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) END AS ratio
       FROM events WHERE event_id < 3000 ORDER BY event_id"""

  /** MATCH_RECOGNIZE over a DERIVED TABLE, inside an aggregating outer query
    * (VERDICT r6 item 3's second nesting case): the parser plans the
    * subquery input first, runs the NFA over it, and splices the result back
    * into the enclosing query — patternRecognition as a true relation
    * production (SqlBase.g4:446), not a statement-level special case. */
  def q_sqlx_match_subquery(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT user_id, count(*) AS n_matches,
         CAST(sum(n_down) AS BIGINT) AS total_down
         FROM (
           SELECT * FROM (
             SELECT user_id, event_id, value FROM events WHERE value > 10
           ) MATCH_RECOGNIZE (
             PARTITION BY user_id
             ORDER BY event_id
             MEASURES FIRST(D.event_id) AS start_id,
                      COUNT(D.*) AS n_down
             ONE ROW PER MATCH
             AFTER MATCH SKIP PAST LAST ROW
             PATTERN (D+ U+)
             DEFINE D AS value < PREV(value),
                    U AS value > PREV(value)
           )
         ) m
         WHERE start_id > 100
         GROUP BY user_id
         ORDER BY user_id""")
  val qSqlxMatchSubquerySql: String =
    """WITH e AS (
         SELECT user_id, event_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events WHERE value > 10),
       c AS (
         SELECT *, CASE WHEN pv IS NULL THEN 'X' WHEN value < pv THEN 'D'
                        WHEN value > pv THEN 'U' ELSE 'X' END AS cls
         FROM e),
       r AS (
         SELECT *, rn - row_number() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp
         FROM c),
       runs AS (
         SELECT user_id, cls, min(rn) AS srn,
           count(*) AS len, min(event_id) AS sid
         FROM r GROUP BY user_id, cls, grp),
       seq AS (
         SELECT *, lead(cls) OVER w AS ncls
         FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY srn))
       SELECT user_id, count(*) AS n_matches, CAST(sum(len) AS BIGINT) AS total_down
       FROM seq WHERE cls = 'D' AND ncls = 'U' AND sid > 100
       GROUP BY user_id ORDER BY user_id"""

  /** User TVF registry surface (reference ConnectorTableFunction): the
    * sequence TVF resolved from SQL text via graft.functions.TableFunctions. */
  def q_tvf_registry(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT sequential_number, sequential_number * 2 AS twice
         FROM TABLE(sequence(1, 200, 2))""")
      .orderBy($"sequential_number")
  }
  val qTvfRegistrySql: String =
    """SELECT range AS sequential_number, range * 2 AS twice
       FROM range(1, 201, 2) ORDER BY sequential_number"""

  /** exclude_columns built-in table function with named TABLE/DESCRIPTOR
    * arguments (reference docs/functions/table.md:33-60;
    * io.trino.operator.table.ExcludeColumnsFunction): the input table minus
    * the descriptor's columns. */
  def q_tvf_exclude_columns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT * FROM TABLE(exclude_columns(
           input => TABLE(nation), columns => DESCRIPTOR(n_name)))
         ORDER BY n_nationkey""")
  }
  val qTvfExcludeColumnsSql: String =
    "SELECT n_nationkey, n_regionkey FROM nation ORDER BY n_nationkey"

  /** MongoDB ObjectId helpers (reference docs/connector/mongodb.md:334-345):
    * timestamp_objectid builds the boundary id whose first 4 bytes are the
    * epoch seconds; objectid_timestamp extracts them back. Round-trips
    * through both directions against a replayed hex build. */
  def q_fn_objectid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT event_id,
           timestamp_objectid(ts) AS oid,
           CAST(objectid_timestamp(timestamp_objectid(ts)) AS STRING) AS rt
         FROM (SELECT event_id, timestamp_seconds(1350000000 + event_id * 7) AS ts
               FROM events WHERE event_id <= 300)
         ORDER BY event_id""")
  }
  val qFnObjectidSql: String =
    """SELECT event_id,
         printf('%08x', 1350000000 + event_id * 7) || '0000000000000000' AS oid,
         strftime(epoch_ms((1350000000 + event_id * 7) * 1000), '%Y-%m-%d %H:%M:%S') AS rt
       FROM events WHERE event_id <= 300 ORDER BY event_id"""

  /** Pipeline TVFs from SQL text: the chunking stage as a table function
    * (`FROM TABLE(chunk_documents(size, stride))` — same kernel as
    * TextPipeline.q_text_chunking and the streaming twin). */
  def q_tvf_chunking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TrinoDialect.sql(s, dir,
      """SELECT doc_id, chunk_id, chunk_text
         FROM TABLE(chunk_documents(16, 12))
         WHERE doc_id < 100""")
      .orderBy($"doc_id", $"chunk_id")
  }
  val qTvfChunkingSql: String =
    """WITH t AS (
         SELECT doc_id, string_split(text, ' ') AS toks,
                len(string_split(text, ' ')) AS n
         FROM documents WHERE doc_id < 100),
       c AS (
         SELECT doc_id, toks,
           CASE WHEN n <= 16 THEN 1
                ELSE CAST((n - 16 + 12 - 1) // 12 + 1 AS INT) END AS n_chunks
         FROM t),
       e AS (
         SELECT doc_id, toks,
                CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_id
         FROM c)
       SELECT doc_id, chunk_id,
              array_to_string(toks[chunk_id * 12 + 1 : chunk_id * 12 + 16], ' ') AS chunk_text
       FROM e ORDER BY doc_id, chunk_id"""

  /** SQL-text DML through the statement front door (SqlBase.g4 :68/:101/
    * :103/:119; executors in sqlx.Statements over catalog.CowTable): a full
    * CTAS → INSERT (with and without column list) → DELETE → UPDATE chain,
    * with the final SELECT's result pinned by a DuckDB replay of the
    * chain's net effect as a pure query. CREATE OR REPLACE makes the entry
    * idempotent across re-invocations in one JVM. */
  def q_sqlx_statements(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE TABLE wh_ord AS
         SELECT o_orderkey AS k, o_custkey AS c,
           CAST(o_totalprice AS DECIMAL(12,2)) AS p
         FROM orders WHERE o_orderkey <= 2000""")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_ord
         SELECT o_orderkey + 1000000, o_custkey,
           CAST(o_totalprice AS DECIMAL(12,2))
         FROM orders WHERE o_orderkey <= 800""")
    TrinoDialect.sql(s, dir,
      "INSERT INTO wh_ord (k, c, p) VALUES (9000001, 35, CAST(100.50 AS DECIMAL(12,2)))")
    TrinoDialect.sql(s, dir, "DELETE FROM wh_ord WHERE k % 10 = 3")
    TrinoDialect.sql(s, dir,
      "UPDATE wh_ord SET p = p + 10 WHERE c % 7 = 0")
    TrinoDialect.sql(s, dir,
      """SELECT c % 5 AS bucket, count(*) AS cnt,
         CAST(sum(p) AS DOUBLE) AS total
         FROM wh_ord GROUP BY c % 5 ORDER BY bucket""")
  }
  val qSqlxStatementsSql: String =
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS c,
           CAST(o_totalprice AS DECIMAL(12,2)) AS p
         FROM orders WHERE o_orderkey <= 2000
         UNION ALL
         SELECT o_orderkey + 1000000, o_custkey,
           CAST(o_totalprice AS DECIMAL(12,2))
         FROM orders WHERE o_orderkey <= 800
         UNION ALL
         SELECT 9000001, 35, CAST(100.50 AS DECIMAL(12,2))),
       kept AS (SELECT * FROM base WHERE k % 10 <> 3),
       upd AS (SELECT k, c,
           CASE WHEN c % 7 = 0 THEN p + 10 ELSE p END AS p
         FROM kept)
       SELECT c % 5 AS bucket, count(*) AS cnt,
         CAST(sum(p) AS DOUBLE) AS total
       FROM upd GROUP BY c % 5 ORDER BY bucket"""

  /** Full conditional MERGE through the SQL front door (SqlBase.g4:222
    * `mergeCase+`, :865-874; reference executor operator/
    * MergeWriterOperator.java:48 + MergeProcessorOperator; lowered onto
    * catalog.CowTable.mergeFull's joined copy-on-write rewrite): ordered
    * WHEN MATCHED [AND cond] THEN DELETE / UPDATE SET col=expr cases with
    * first-match-wins, plus a conditional WHEN NOT MATCHED INSERT with a
    * column list. The oracle replays the net effect in DuckDB as a pure
    * query — including the conditional DELETE arm. */
  def q_sqlx_merge_full(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE TABLE wh_mergef AS
         SELECT n_nationkey AS k, n_name AS name,
           CAST(n_regionkey AS BIGINT) AS r,
           CAST(100.00 AS DECIMAL(12,2)) AS bal
         FROM nation""")
    TrinoDialect.sql(s, dir,
      """MERGE INTO wh_mergef t USING (
           SELECT n_nationkey + 15 AS k,
             CAST(n_regionkey AS BIGINT) AS r2, n_name AS nm
           FROM nation) s
         ON t.k = s.k
         WHEN MATCHED AND s.r2 = 0 THEN DELETE
         WHEN MATCHED AND s.r2 = 1 THEN UPDATE SET bal = t.bal + 50
         WHEN MATCHED THEN UPDATE SET bal = t.bal - 10, name = s.nm
         WHEN NOT MATCHED AND s.r2 >= 3 THEN
           INSERT (k, name, r, bal) VALUES (s.k, s.nm, s.r2, CAST(5.55 AS DECIMAL(12,2)))""")
    TrinoDialect.sql(s, dir,
      """SELECT k, name, r, CAST(bal AS DOUBLE) AS bal
         FROM wh_mergef ORDER BY k""")
  }
  val qSqlxMergeFullSql: String =
    """WITH t AS (
         SELECT n_nationkey AS k, n_name AS name,
           CAST(n_regionkey AS BIGINT) AS r,
           CAST(100.00 AS DECIMAL(12,2)) AS bal
         FROM nation),
       s AS (
         SELECT n_nationkey + 15 AS k,
           CAST(n_regionkey AS BIGINT) AS r2, n_name AS nm
         FROM nation),
       merged AS (
         SELECT t.k,
           CASE WHEN s.k IS NOT NULL AND s.r2 <> 0 AND s.r2 <> 1
                THEN s.nm ELSE t.name END AS name,
           t.r,
           CASE WHEN s.k IS NULL THEN t.bal
                WHEN s.r2 = 1 THEN t.bal + 50
                ELSE t.bal - 10 END AS bal
         FROM t LEFT JOIN s ON t.k = s.k
         WHERE s.k IS NULL OR s.r2 <> 0),
       ins AS (
         SELECT s.k, s.nm AS name, s.r2 AS r,
           CAST(5.55 AS DECIMAL(12,2)) AS bal
         FROM s LEFT JOIN t ON s.k = t.k
         WHERE t.k IS NULL AND s.r2 >= 3)
       SELECT k, name, r, CAST(bal AS DOUBLE) AS bal
       FROM (SELECT * FROM merged UNION ALL SELECT * FROM ins)
       ORDER BY k"""

  /** Table BRANCHES through the SQL front door (SqlBase.g4:135-142
    * CREATE/DROP/ALTER BRANCH … FAST FORWARD, '@branch' DML at :80/:82 —
    * the iceberg connector's branch refs, here named head pointers over
    * the CoW table's linear version history): writes to wh_br@dev leave
    * main untouched until FAST FORWARD publishes the branch head as main.
    * The oracle replays the net effect of the branch edits as a pure
    * query. */
  def q_sqlx_branches(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE TABLE wh_br AS
         SELECT n_nationkey AS k, n_regionkey AS r FROM nation""")
    TrinoDialect.sql(s, dir, "CREATE OR REPLACE BRANCH dev IN TABLE wh_br")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_br@dev
         SELECT n_nationkey + 100, n_regionkey FROM nation WHERE n_nationkey < 10""")
    TrinoDialect.sql(s, dir, "DELETE FROM wh_br@dev WHERE r = 0")
    // main is still the untouched CTAS snapshot here (branch isolation);
    // FAST FORWARD then publishes dev's head as main
    val mainBefore = TrinoDialect.sql(s, dir,
      "SELECT count(*) AS n FROM wh_br").head().getLong(0)
    require(mainBefore == 25L,
      s"branch writes leaked into main: $mainBefore rows")
    TrinoDialect.sql(s, dir,
      "ALTER BRANCH main IN TABLE wh_br FAST FORWARD TO dev")
    TrinoDialect.sql(s, dir,
      """SELECT r, count(*) AS n, sum(k) AS sum_k
         FROM wh_br GROUP BY r ORDER BY r""")
  }
  val qSqlxBranchesSql: String =
    """SELECT r, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k FROM (
         SELECT n_nationkey AS k, n_regionkey AS r FROM nation
         UNION ALL
         SELECT n_nationkey + 100, n_regionkey FROM nation WHERE n_nationkey < 10)
       WHERE r <> 0 GROUP BY r ORDER BY r"""

  /** Metadata-only ALTER TABLE evolution through the SQL front door
    * (SqlBase.g4 :84ff; sqlx.Statements declared-schema overlay): CTAS →
    * ADD COLUMN (old files NULL-fill) → INSERT carrying it → RENAME COLUMN
    * (reads coalesce both physical generations) → DROP COLUMN. No data file
    * is rewritten at any step; the oracle replays the net effect as a pure
    * query. */
  def q_sqlx_ddl_alter(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE TABLE wh_alter AS
         SELECT n_nationkey AS k, n_name AS label, n_regionkey AS r
         FROM nation""")
    TrinoDialect.sql(s, dir, "ALTER TABLE wh_alter ADD COLUMN score DOUBLE")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_alter
         SELECT n_nationkey + 100, n_name, n_regionkey,
           CAST(n_nationkey AS DOUBLE) / 4
         FROM nation WHERE n_nationkey < 10""")
    TrinoDialect.sql(s, dir, "ALTER TABLE wh_alter RENAME COLUMN label TO nation_name")
    TrinoDialect.sql(s, dir, "ALTER TABLE wh_alter DROP COLUMN r")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_alter VALUES (999, 'XANADU', CAST(9.75 AS DOUBLE))""")
    TrinoDialect.sql(s, dir,
      """SELECT k, nation_name, score
         FROM wh_alter ORDER BY k, nation_name""")
  }
  val qSqlxDdlAlterSql: String =
    """SELECT k, nation_name, score FROM (
         SELECT n_nationkey AS k, n_name AS nation_name,
           CAST(NULL AS DOUBLE) AS score FROM nation
         UNION ALL
         SELECT n_nationkey + 100, n_name, CAST(n_nationkey AS DOUBLE) / 4
         FROM nation WHERE n_nationkey < 10
         UNION ALL
         SELECT 999, 'XANADU', CAST(9.75 AS DOUBLE))
       ORDER BY k, nation_name"""

  /** Column DEFAULT / NOT NULL / positioned ADD COLUMN / SET DATA TYPE
    * through the SQL front door (SqlBase.g4 :92-106, :253
    * columnDefinition): INSERTs that omit defaulted columns take the
    * declared literal, ADD COLUMN AFTER places the column mid-schema,
    * SET DATA TYPE widens int → bigint, and SET/DROP DEFAULT switch what an
    * omitting INSERT writes. The oracle replays the surviving net state. */
  def q_sqlx_ddl_defaults(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir, "DROP TABLE IF EXISTS wh_defs")
    TrinoDialect.sql(s, dir,
      """CREATE TABLE wh_defs (
           id int NOT NULL,
           status varchar DEFAULT 'new',
           score double DEFAULT 0.25)""")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_defs (id)
         SELECT n_nationkey FROM nation WHERE n_nationkey < 10""")
    TrinoDialect.sql(s, dir,
      "ALTER TABLE wh_defs ALTER COLUMN status SET DEFAULT 'queued'")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_defs (id, score)
         SELECT n_nationkey + 100, CAST(n_nationkey AS DOUBLE)
         FROM nation WHERE n_nationkey < 5""")
    TrinoDialect.sql(s, dir, "ALTER TABLE wh_defs ALTER COLUMN score DROP DEFAULT")
    TrinoDialect.sql(s, dir, "ALTER TABLE wh_defs ADD COLUMN tag varchar DEFAULT 'z' AFTER id")
    TrinoDialect.sql(s, dir, "ALTER TABLE wh_defs ALTER COLUMN id SET DATA TYPE bigint")
    TrinoDialect.sql(s, dir,
      "INSERT INTO wh_defs (id, status) VALUES (3000000000, 'big')")
    TrinoDialect.sql(s, dir,
      "SELECT id, tag, status, score FROM wh_defs ORDER BY id")
  }
  val qSqlxDdlDefaultsSql: String =
    """SELECT id, tag, status, score FROM (
         SELECT CAST(n_nationkey AS BIGINT) AS id, CAST(NULL AS VARCHAR) AS tag,
                'new' AS status, 0.25 AS score
         FROM nation WHERE n_nationkey < 10
         UNION ALL
         SELECT n_nationkey + 100, NULL, 'queued', CAST(n_nationkey AS DOUBLE)
         FROM nation WHERE n_nationkey < 5
         UNION ALL
         SELECT 3000000000, 'z', 'big', CAST(NULL AS DOUBLE))
       ORDER BY id"""

  /** Partitioned CTAS through the SQL front door (reference: the hive /
    * iceberg connectors' `partitioned_by` table property): data lands in
    * hive-style col=value directories, reads recover the partition column
    * and Catalyst prunes partitions (CowTableSpec asserts numFiles), and
    * DML composes (partition-scoped DELETE + an INSERT into one
    * partition). The DuckDB oracle replays the net state — values are
    * layout-independent. */
  def q_sqlx_partitioned(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir, "DROP TABLE IF EXISTS wh_part")
    TrinoDialect.sql(s, dir,
      """CREATE TABLE wh_part WITH (partitioned_by = ARRAY['region']) AS
         SELECT c_custkey AS k, c_acctbal AS bal, c_nationkey % 5 AS region
         FROM customer WHERE c_custkey <= 600""")
    TrinoDialect.sql(s, dir, "DELETE FROM wh_part WHERE region = 3 AND k % 2 = 0")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_part
         SELECT c_custkey + 10000, c_acctbal, 3
         FROM customer WHERE c_custkey <= 5""")
    TrinoDialect.sql(s, dir,
      """SELECT region, count(*) AS n,
           CAST(sum(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total
         FROM wh_part WHERE region IN (2, 3) GROUP BY region ORDER BY region""")
  }
  /** Bucketed warehouse tables (reference: plugin/trino-hive
    * HiveTableProperties.java:54 `bucketed_by`/`bucket_count`/`sorted_by`;
    * bucketed execution HiveBucketing.java): CTAS with a hash-bucket
    * layout, CoW mutations that preserve it (rewritten buckets get fresh
    * files, untouched files carry by hardlink), and a self-join +
    * aggregation on the bucket key that must plan ZERO exchanges — the
    * whole point of bucketing at 100 TB: repeated joins/aggs on the bucket
    * key never shuffle. The require below makes the exchange-free plan part
    * of the correctness gate, not just a spec assert. */
  def q_sqlx_bucketed(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir, "DROP TABLE IF EXISTS wh_bkt")
    TrinoDialect.sql(s, dir,
      """CREATE TABLE wh_bkt WITH (bucketed_by = ARRAY['cust'],
           bucket_count = 8, sorted_by = ARRAY['cust']) AS
         SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS price
         FROM orders""")
    TrinoDialect.sql(s, dir, "DELETE FROM wh_bkt WHERE k % 97 = 0")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_bkt
         SELECT o_orderkey + 1000000, o_custkey, o_totalprice
         FROM orders WHERE o_orderkey % 500 = 1""")
    val out = TrinoDialect.sql(s, dir,
      """SELECT a.cust, count(*) AS n_pairs,
           CAST(sum(CAST(b.price AS DECIMAL(12,2))) AS DOUBLE) AS pair_price
         FROM wh_bkt a JOIN wh_bkt b ON a.cust = b.cust
         GROUP BY a.cust
         HAVING count(*) >= 4
         ORDER BY a.cust""")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(out.queryExecution.executedPlan.toString).length
    require(exchanges == 0,
      s"bucketed self-join + agg must plan zero hash exchanges, got $exchanges")
    out
  }
  val qSqlxBucketedSql: String =
    """WITH t AS (
         SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS price
         FROM orders WHERE o_orderkey % 97 <> 0
         UNION ALL
         SELECT o_orderkey + 1000000, o_custkey, o_totalprice
         FROM orders WHERE o_orderkey % 500 = 1)
       SELECT a.cust, count(*) AS n_pairs,
         CAST(sum(CAST(b.price AS DECIMAL(12,2))) AS DOUBLE) AS pair_price
       FROM t a JOIN t b ON a.cust = b.cust
       GROUP BY a.cust
       HAVING count(*) >= 4
       ORDER BY a.cust"""

  /** Partitioned + bucketed warehouse table (r15; the reference's hive
    * connector composes both): partition directories each hold their own
    * bucket file set, so a partition predicate prunes directories AND the
    * bucket layout still reports HashPartitioning — the partition-filtered
    * self-join + aggregation on the bucket key below must plan ZERO
    * exchanges (required in-query). CoW DELETE/INSERT keep the nested
    * layout (rewritten buckets per partition, hardlink carry). */
  def q_sqlx_bucketed_partitioned(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir, "DROP TABLE IF EXISTS wh_pb")
    TrinoDialect.sql(s, dir,
      """CREATE TABLE wh_pb WITH (partitioned_by = ARRAY['rgn'],
           bucketed_by = ARRAY['cust'], bucket_count = 4,
           sorted_by = ARRAY['cust']) AS
         SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS price,
           CAST(o_custkey % 3 AS INT) AS rgn
         FROM orders""")
    TrinoDialect.sql(s, dir, "DELETE FROM wh_pb WHERE cust % 41 = 0")
    TrinoDialect.sql(s, dir,
      """INSERT INTO wh_pb
         SELECT o_orderkey + 2000000, o_custkey, o_totalprice,
           CAST(o_custkey % 3 AS INT)
         FROM orders WHERE o_orderkey % 400 = 1""")
    val out = TrinoDialect.sql(s, dir,
      """SELECT a.cust, count(*) AS n_pairs,
           CAST(sum(CAST(b.price AS DECIMAL(12,2))) AS DOUBLE) AS pair_price
         FROM wh_pb a JOIN wh_pb b ON a.cust = b.cust
         WHERE a.rgn = 1 AND b.rgn = 1
         GROUP BY a.cust
         HAVING count(*) >= 4
         ORDER BY a.cust""")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(out.queryExecution.executedPlan.toString).length
    require(exchanges == 0,
      s"partitioned+bucketed join + agg must plan zero hash exchanges, got $exchanges")
    out
  }
  val qSqlxBucketedPartitionedSql: String =
    """WITH t AS (
         SELECT o_orderkey AS k, o_custkey AS cust, o_totalprice AS price,
           CAST(o_custkey % 3 AS INT) AS rgn
         FROM orders WHERE o_custkey % 41 <> 0
         UNION ALL
         SELECT o_orderkey + 2000000, o_custkey, o_totalprice,
           CAST(o_custkey % 3 AS INT)
         FROM orders WHERE o_orderkey % 400 = 1)
       SELECT a.cust, count(*) AS n_pairs,
         CAST(sum(CAST(b.price AS DECIMAL(12,2))) AS DOUBLE) AS pair_price
       FROM t a JOIN t b ON a.cust = b.cust
       WHERE a.rgn = 1 AND b.rgn = 1
       GROUP BY a.cust
       HAVING count(*) >= 4
       ORDER BY a.cust"""

  /** CORRESPONDING set operations (reference SqlBase.g4:314, release 475:
    * match columns by NAME — the intersection, in left order — instead of
    * by position; the BY (cols) form is rejected like the reference).
    * Resolved at plan time by probing both sides' schemas and projecting
    * onto the common columns. */
  def q_sqlx_corresponding(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """SELECT n_name AS name, n_nationkey AS id FROM nation
         UNION ALL CORRESPONDING
         SELECT r_regionkey + 100 AS id, r_name AS name, 'x' AS extra FROM region
         ORDER BY id, name""")
  }
  val qSqlxCorrespondingSql: String =
    """SELECT name, id FROM (
         SELECT n_name AS name, n_nationkey AS id FROM nation
         UNION ALL
         SELECT r_name AS name, r_regionkey + 100 AS id FROM region)
       ORDER BY id, name"""

  val qSqlxPartitionedSql: String =
    """WITH t AS (
         SELECT c_custkey AS k, c_acctbal AS bal, c_nationkey % 5 AS region
         FROM customer WHERE c_custkey <= 600),
       surviving AS (
         SELECT * FROM t WHERE NOT (region = 3 AND k % 2 = 0)
         UNION ALL
         SELECT c_custkey + 10000, c_acctbal, 3
         FROM customer WHERE c_custkey <= 5)
       SELECT region, count(*) AS n,
         CAST(sum(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) AS total
       FROM surviving WHERE region IN (2, 3) GROUP BY region ORDER BY region"""

  /** Multi-statement transactions + CALL procedures through the SQL front
    * door (SqlBase.g4 :90-94; reference transaction semantics in
    * core/trino-main io.trino.execution.StartTransactionTask): a rolled-back
    * transaction leaves NO trace (catalog maps restored, per-table CoW
    * versions rolled back via a metadata-only snapshot publish), a committed
    * one is durable, and CALL rollback_to_version rewinds past the commit.
    * The oracle replays only the surviving effects as a pure query. */
  def q_sqlx_txn(s: SparkSession, dir: String): DataFrame = {
    TrinoDialect.sql(s, dir,
      """CREATE OR REPLACE TABLE wh_txn AS
         SELECT n_nationkey AS k, n_regionkey AS r FROM nation""")
    // rolled back: invisible in the final read
    TrinoDialect.sql(s, dir, "START TRANSACTION")
    TrinoDialect.sql(s, dir, "INSERT INTO wh_txn VALUES (500, 9)")
    TrinoDialect.sql(s, dir, "UPDATE wh_txn SET r = r + 100 WHERE k < 10")
    TrinoDialect.sql(s, dir, "DELETE FROM wh_txn WHERE k >= 20")
    TrinoDialect.sql(s, dir, "ROLLBACK")
    // committed: durable
    TrinoDialect.sql(s, dir, "START TRANSACTION")
    TrinoDialect.sql(s, dir, "INSERT INTO wh_txn VALUES (600, 3)")
    TrinoDialect.sql(s, dir, "COMMIT")
    // version history after the steps above: v1 CTAS … commit-INSERT at the
    // top; CALL rewinds to the post-rollback snapshot, then the last INSERT
    // lands on the rewound state
    TrinoDialect.sql(s, dir,
      "CALL system.rollback_to_version(table => 'wh_txn', version => 1)")
    TrinoDialect.sql(s, dir, "INSERT INTO wh_txn VALUES (700, 4)")
    TrinoDialect.sql(s, dir,
      """SELECT r AS region_bucket, count(*) AS n, sum(k) AS sum_k
         FROM wh_txn GROUP BY r ORDER BY region_bucket""")
  }
  val qSqlxTxnSql: String =
    """SELECT r AS region_bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k FROM (
         SELECT n_nationkey AS k, n_regionkey AS r FROM nation
         UNION ALL SELECT 700, 4)
       GROUP BY r ORDER BY region_bucket"""

  /** SHOW STATS FOR <table> (SqlBase.g4 :141; the reference's
    * StatisticsAggregationPlanner shape): one exact distributed aggregation
    * pass — per-column ndv / nulls fraction / min / max / string data size
    * plus the summary row-count row. DuckDB replays each statistic. */
  def q_sqlx_show_stats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    TrinoDialect.sql(s, dir, "SHOW STATS FOR customer")
      .withColumn("nulls_fraction", round(col("nulls_fraction"), 9))
      .orderBy(col("column_name").asc_nulls_last)
  }
  val qSqlxShowStatsSql: String =
    """WITH s AS (
         SELECT 'c_acctbal' AS column_name, CAST(NULL AS DOUBLE) AS data_size,
           CAST(count(DISTINCT c_acctbal) AS DOUBLE) AS distinct_values_count,
           round(CAST(count(*) - count(c_acctbal) AS DOUBLE) / count(*), 9) AS nulls_fraction,
           CAST(min(c_acctbal) AS VARCHAR) AS low_value,
           CAST(max(c_acctbal) AS VARCHAR) AS high_value,
           CAST(NULL AS DOUBLE) AS row_count
         FROM customer
         UNION ALL
         SELECT 'c_custkey', NULL,
           CAST(count(DISTINCT c_custkey) AS DOUBLE),
           round(CAST(count(*) - count(c_custkey) AS DOUBLE) / count(*), 9),
           CAST(min(c_custkey) AS VARCHAR), CAST(max(c_custkey) AS VARCHAR), NULL
         FROM customer
         UNION ALL
         SELECT 'c_mktsegment', CAST(sum(len(c_mktsegment)) AS DOUBLE),
           CAST(count(DISTINCT c_mktsegment) AS DOUBLE),
           round(CAST(count(*) - count(c_mktsegment) AS DOUBLE) / count(*), 9),
           min(c_mktsegment), max(c_mktsegment), NULL
         FROM customer
         UNION ALL
         SELECT 'c_name', CAST(sum(len(c_name)) AS DOUBLE),
           CAST(count(DISTINCT c_name) AS DOUBLE),
           round(CAST(count(*) - count(c_name) AS DOUBLE) / count(*), 9),
           min(c_name), max(c_name), NULL
         FROM customer
         UNION ALL
         SELECT 'c_nationkey', NULL,
           CAST(count(DISTINCT c_nationkey) AS DOUBLE),
           round(CAST(count(*) - count(c_nationkey) AS DOUBLE) / count(*), 9),
           CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR), NULL
         FROM customer
         UNION ALL
         SELECT NULL, NULL, NULL, NULL, NULL, NULL, CAST(count(*) AS DOUBLE)
         FROM customer)
       SELECT * FROM s ORDER BY column_name NULLS LAST"""

  /** Geometry through the SQL FRONT DOOR by the reference's call names
    * (GeoFunctions.java; registered in functions.Registry round 8):
    * constructors, measures, predicates, overlay ops, and the octagonal
    * buffer — all as SQL function calls, oracle-replayed in closed form. */
  def q_sqlx_geo_sql(s: SparkSession, dir: String): DataFrame =
    TrinoDialect.sql(s, dir,
      """SELECT c_custkey,
         CAST(round(ST_Area(sq) * 1e6) AS BIGINT) AS area_e6,
         CAST(round(ST_Perimeter(sq) * 1e6) AS BIGINT) AS perim_e6,
         CAST(round(ST_Area(ST_Buffer(sq, 0.5)) * 1e6) AS BIGINT) AS buf_area_e6,
         CAST(ST_NumPoints(sq) AS BIGINT) AS n_points,
         ST_GeometryType(sq) AS gtype,
         ST_IsValid(sq) AS valid,
         CAST(round(ST_X(ST_Centroid(sq)) * 1e6) AS BIGINT) AS cx_e6,
         CAST(round(ST_Y(ST_Centroid(sq)) * 1e6) AS BIGINT) AS cy_e6,
         CAST(round(ST_Distance(ST_Point(px, py), ST_Point(px + 3, py + 4)) * 1e6) AS BIGINT) AS dist_e6,
         ST_Disjoint(sq, sq2) AS disjoint_far,
         CAST(round(ST_Area(ST_Union(sq, sq2)) * 1e6) AS BIGINT) AS union_area_e6,
         CAST(round(ST_XMax(ST_Envelope(sq)) * 1e6) AS BIGINT) AS xmax_e6
         FROM (
           SELECT c_custkey,
             CAST(c_custkey * 7 % 100 AS DOUBLE) AS px,
             CAST(c_custkey * 13 % 100 AS DOUBLE) AS py,
             CAST(c_custkey % 3 + 1 AS DOUBLE) AS e,
             ST_GeometryFromText(format('POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
               c_custkey * 7 % 100, c_custkey * 13 % 100,
               c_custkey * 7 % 100 + (c_custkey % 3 + 1), c_custkey * 13 % 100,
               c_custkey * 7 % 100 + (c_custkey % 3 + 1), c_custkey * 13 % 100 + (c_custkey % 3 + 1),
               c_custkey * 7 % 100, c_custkey * 13 % 100 + (c_custkey % 3 + 1),
               c_custkey * 7 % 100, c_custkey * 13 % 100)) AS sq,
             ST_GeometryFromText(format('POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))',
               c_custkey * 7 % 100 + 500, c_custkey * 13 % 100,
               c_custkey * 7 % 100 + 501, c_custkey * 13 % 100,
               c_custkey * 7 % 100 + 501, c_custkey * 13 % 100 + 1,
               c_custkey * 7 % 100 + 500, c_custkey * 13 % 100 + 1,
               c_custkey * 7 % 100 + 500, c_custkey * 13 % 100)) AS sq2
           FROM customer WHERE c_custkey <= 500) t
         ORDER BY c_custkey""")
  val qSqlxGeoSqlSql: String =
    """SELECT c_custkey,
       CAST(round(e * e * 1e6) AS BIGINT) AS area_e6,
       CAST(round(4 * e * 1e6) AS BIGINT) AS perim_e6,
       CAST(round((e*e + 4*e*0.5 + 4*(sqrt(2.0)/2)*0.25) * 1e6) AS BIGINT) AS buf_area_e6,
       CAST(5 AS BIGINT) AS n_points,
       'ST_Polygon' AS gtype,
       TRUE AS valid,
       CAST(round((px + e/2) * 1e6) AS BIGINT) AS cx_e6,
       CAST(round((py + e/2) * 1e6) AS BIGINT) AS cy_e6,
       CAST(5000000 AS BIGINT) AS dist_e6,
       TRUE AS disjoint_far,
       CAST(round((e * e + 1) * 1e6) AS BIGINT) AS union_area_e6,
       CAST(round((px + e) * 1e6) AS BIGINT) AS xmax_e6
       FROM (
         SELECT c_custkey,
           CAST(c_custkey * 7 % 100 AS DOUBLE) AS px,
           CAST(c_custkey * 13 % 100 AS DOUBLE) AS py,
           CAST(c_custkey % 3 + 1 AS DOUBLE) AS e
         FROM customer WHERE c_custkey <= 500) t
       ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map(
    "q_sqlx_geo_sql" -> q_sqlx_geo_sql _,
    "q_sqlx_statements" -> q_sqlx_statements _,
    "q_sqlx_merge_full" -> q_sqlx_merge_full _,
    "q_sqlx_branches" -> q_sqlx_branches _,
    "q_sqlx_ddl_alter" -> q_sqlx_ddl_alter _,
    "q_sqlx_ddl_defaults" -> q_sqlx_ddl_defaults _,
    "q_sqlx_partitioned" -> q_sqlx_partitioned _,
    "q_sqlx_bucketed" -> q_sqlx_bucketed _,
    "q_sqlx_bucketed_partitioned" -> q_sqlx_bucketed_partitioned _,
    "q_sqlx_corresponding" -> q_sqlx_corresponding _,
    "q_sqlx_txn" -> q_sqlx_txn _,
    "q_sqlx_show_stats" -> q_sqlx_show_stats _,
    "q_tvf_registry" -> q_tvf_registry _,
    "q_tvf_exclude_columns" -> q_tvf_exclude_columns _,
    "q_fn_objectid" -> q_fn_objectid _,
    "q_tvf_chunking" -> q_tvf_chunking _,
    "q_sqlx_try" -> q_sqlx_try _,
    "q_sqlx_scalar" -> q_sqlx_scalar _,
    "q_sqlx_unnest" -> q_sqlx_unnest _,
    "q_sqlx_unnest_zip" -> q_sqlx_unnest_zip _,
    "q_sqlx_unnest_map" -> q_sqlx_unnest_map _,
    "q_sqlx_match_recognize" -> q_sqlx_match_recognize _,
    "q_sqlx_match_window" -> q_sqlx_match_window _,
    "q_sqlx_match_window2" -> q_sqlx_match_window2 _,
    "q_sqlx_match_window3" -> q_sqlx_match_window3 _,
    "q_sqlx_match_window4" -> q_sqlx_match_window4 _,
    "q_sqlx_match_window5" -> q_sqlx_match_window5 _,
    "q_sqlx_match_window6" -> q_sqlx_match_window6 _,
    "q_sqlx_match_rows" -> q_sqlx_match_rows _,
    "q_sqlx_match_quant" -> q_sqlx_match_quant _,
    "q_sqlx_match_reluctant" -> q_sqlx_match_reluctant _,
    "q_sqlx_match_anchors" -> q_sqlx_match_anchors _,
    "q_sqlx_match_empty" -> q_sqlx_match_empty _,
    "q_sqlx_match_empty_quant" -> q_sqlx_match_empty_quant _,
    "q_sqlx_match_empty_omit" -> q_sqlx_match_empty_omit _,
    "q_sqlx_match_empty_one" -> q_sqlx_match_empty_one _,
    "q_sqlx_match_unmatched" -> q_sqlx_match_unmatched _,
    "q_sqlx_match_multikey" -> q_sqlx_match_multikey _,
    "q_sqlx_match_skip_to" -> q_sqlx_match_skip_to _,
    "q_sqlx_match_define_expr" -> q_sqlx_match_define_expr _,
    "q_sqlx_match_count_define" -> q_sqlx_match_count_define _,
    "q_sqlx_match_measure_offset" -> q_sqlx_match_measure_offset _,
    "q_sqlx_match_anchor_define" -> q_sqlx_match_anchor_define _,
    "q_sqlx_create_function" -> q_sqlx_create_function _,
    "q_sqlx_listagg" -> q_sqlx_listagg _,
    "q_sqlx_routine_loop" -> q_sqlx_routine_loop _,
    "q_sqlx_routine_collatz" -> q_sqlx_routine_collatz _,
    "q_sqlx_routine_compound" -> q_sqlx_routine_compound _,
    "q_sqlx_python_udf" -> q_sqlx_python_udf _,
    "q_sqlx_fetch_ties" -> q_sqlx_fetch_ties _,
    "q_sqlx_at_timezone" -> q_sqlx_at_timezone _,
    "q_sqlx_prepare" -> q_sqlx_prepare _,
    "q_sqlx_try_window" -> q_sqlx_try_window _,
    "q_sqlx_match_subquery" -> q_sqlx_match_subquery _)

  val oracles: Map[String, String] = Map(
    "q_sqlx_geo_sql" -> qSqlxGeoSqlSql,
    "q_sqlx_statements" -> qSqlxStatementsSql,
    "q_sqlx_merge_full" -> qSqlxMergeFullSql,
    "q_sqlx_branches" -> qSqlxBranchesSql,
    "q_sqlx_ddl_alter" -> qSqlxDdlAlterSql,
    "q_sqlx_ddl_defaults" -> qSqlxDdlDefaultsSql,
    "q_sqlx_partitioned" -> qSqlxPartitionedSql,
    "q_sqlx_bucketed" -> qSqlxBucketedSql,
    "q_sqlx_bucketed_partitioned" -> qSqlxBucketedPartitionedSql,
    "q_sqlx_corresponding" -> qSqlxCorrespondingSql,
    "q_sqlx_txn" -> qSqlxTxnSql,
    "q_sqlx_show_stats" -> qSqlxShowStatsSql,
    "q_tvf_registry" -> qTvfRegistrySql,
    "q_tvf_exclude_columns" -> qTvfExcludeColumnsSql,
    "q_fn_objectid" -> qFnObjectidSql,
    "q_tvf_chunking" -> qTvfChunkingSql,
    "q_sqlx_try" -> qSqlxTrySql,
    "q_sqlx_scalar" -> qSqlxScalarSql,
    "q_sqlx_unnest" -> qSqlxUnnestSql,
    "q_sqlx_unnest_zip" -> qSqlxUnnestZipSql,
    "q_sqlx_unnest_map" -> qSqlxUnnestMapSql,
    "q_sqlx_match_recognize" -> qSqlxMatchRecognizeSql,
    "q_sqlx_match_window" -> qSqlxMatchWindowSql,
    "q_sqlx_match_window2" -> qSqlxMatchWindow2Sql,
    "q_sqlx_match_window3" -> qSqlxMatchWindow3Sql,
    "q_sqlx_match_window4" -> qSqlxMatchWindow4Sql,
    "q_sqlx_match_window5" -> qSqlxMatchWindow5Sql,
    "q_sqlx_match_window6" -> qSqlxMatchWindow6Sql,
    "q_sqlx_match_rows" -> qSqlxMatchRowsSql,
    "q_sqlx_match_quant" -> qSqlxMatchQuantSql,
    "q_sqlx_match_reluctant" -> qSqlxMatchReluctantSql,
    "q_sqlx_match_anchors" -> qSqlxMatchAnchorsSql,
    "q_sqlx_match_empty" -> qSqlxMatchEmptySql,
    "q_sqlx_match_empty_quant" -> qSqlxMatchEmptyQuantSql,
    "q_sqlx_match_empty_omit" -> qSqlxMatchEmptyOmitSql,
    "q_sqlx_match_empty_one" -> qSqlxMatchEmptyOneSql,
    "q_sqlx_match_unmatched" -> qSqlxMatchUnmatchedSql,
    "q_sqlx_match_multikey" -> qSqlxMatchMultikeySql,
    "q_sqlx_match_skip_to" -> qSqlxMatchSkipToSql,
    "q_sqlx_match_define_expr" -> qSqlxMatchDefineExprSql,
    "q_sqlx_match_count_define" -> qSqlxMatchCountDefineSql,
    "q_sqlx_match_measure_offset" -> qSqlxMatchMeasureOffsetSql,
    "q_sqlx_match_anchor_define" -> qSqlxMatchAnchorDefineSql,
    "q_sqlx_create_function" -> qSqlxCreateFunctionSql,
    "q_sqlx_listagg" -> qSqlxListaggSql,
    "q_sqlx_routine_loop" -> qSqlxRoutineLoopSql,
    "q_sqlx_routine_collatz" -> qSqlxRoutineCollatzSql,
    "q_sqlx_routine_compound" -> qSqlxRoutineCompoundSql,
    "q_sqlx_python_udf" -> qSqlxPythonUdfSql,
    "q_sqlx_fetch_ties" -> qSqlxFetchTiesSql,
    "q_sqlx_at_timezone" -> qSqlxAtTimezoneSql,
    "q_sqlx_prepare" -> qSqlxPrepareSql,
    "q_sqlx_try_window" -> qSqlxTryWindowSql,
    "q_sqlx_match_subquery" -> qSqlxMatchSubquerySql)
}
