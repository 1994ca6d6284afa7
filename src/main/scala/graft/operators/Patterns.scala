package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.plans.{MatchRecognize, RowPattern}

/** MATCH_RECOGNIZE queries (SURVEY.md §2.5; reference plan node
  * sql/planner/plan/PatternRecognitionNode.java, matcher
  * operator/window/matcher/Matcher.java:28).
  *
  * q_match_recognize is the reference's canonical V-shape example: per user,
  * ordered by event_id, find maximal price declines followed by recoveries —
  * PATTERN (D+ U+), DEFINE D AS value < PREV(value), U AS value > PREV(value),
  * ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW. The DuckDB oracle
  * derives the identical matches with run-length window SQL (maximal D-runs
  * immediately followed by U-runs), which is exact for this pattern because
  * greedy D+ U+ with skip-past-last-row consumes whole classification runs.
  */
object Patterns {

  def q_match_recognize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = table(s, dir, "events").select($"user_id", $"event_id", $"value")
    // column indices in the projected row: 0=user_id, 1=event_id, 2=value
    val down: RowPattern.Predicate =
      (p: IndexedSeq[Row], i: Int) => i > 0 && p(i).getDouble(2) < p(i - 1).getDouble(2)
    val up: RowPattern.Predicate =
      (p: IndexedSeq[Row], i: Int) => i > 0 && p(i).getDouble(2) > p(i - 1).getDouble(2)
    val measures = Seq(
      MatchRecognize.Measure("start_id", LongType, (p, m) => p(m.firstIdx("D")).getLong(1)),
      MatchRecognize.Measure("end_id", LongType, (p, m) => p(m.lastIdx("U")).getLong(1)),
      MatchRecognize.Measure("n_down", LongType, (p, m) => m.countOf("D")),
      MatchRecognize.Measure("n_up", LongType, (p, m) => m.countOf("U")),
      MatchRecognize.Measure("peak", DoubleType, (p, m) => p(m.firstIdx("D") - 1).getDouble(2)),
      MatchRecognize.Measure("bottom", DoubleType, (p, m) => p(m.lastIdx("D")).getDouble(2)),
      MatchRecognize.Measure("recovery", DoubleType, (p, m) => p(m.lastIdx("U")).getDouble(2)))
    MatchRecognize.oneRowPerMatch(
        e, "user_id", "event_id", "D+ U+",
        Map("D" -> down, "U" -> up), measures)
      .orderBy($"user_id", $"start_id")
  }
  val qMatchRecognizeSql: String =
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
         SELECT user_id, cls, min(rn) AS srn, max(rn) AS ern,
           count(*) AS len, min(event_id) AS sid, max(event_id) AS eid,
           min_by(pv, rn) AS first_pv, max_by(value, rn) AS last_val
         FROM r GROUP BY user_id, cls, grp),
       seq AS (
         SELECT *, lead(cls) OVER w AS ncls, lead(len) OVER w AS nlen,
           lead(eid) OVER w AS neid, lead(last_val) OVER w AS nlast
         FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY srn))
       SELECT user_id, sid AS start_id, neid AS end_id,
         CAST(len AS BIGINT) AS n_down, CAST(nlen AS BIGINT) AS n_up,
         first_pv AS peak, last_val AS bottom, nlast AS recovery
       FROM seq WHERE cls = 'D' AND ncls = 'U'
       ORDER BY user_id, start_id"""

  /** ALL ROWS PER MATCH + CLASSIFIER()/MATCH_NUMBER() on the same V-shape
    * pattern: every matched row is emitted with its classifying symbol and the
    * 1-based match number within its partition. The DuckDB oracle extends the
    * run-length formulation: matched rows are the D-run ∪ following U-run
    * spans, classifier comes from the run class, match_number from ranking the
    * match starts per user. */
  def q_match_recognize_rows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = table(s, dir, "events").select($"user_id", $"event_id", $"value")
    val down: RowPattern.Predicate =
      (p: IndexedSeq[Row], i: Int) => i > 0 && p(i).getDouble(2) < p(i - 1).getDouble(2)
    val up: RowPattern.Predicate =
      (p: IndexedSeq[Row], i: Int) => i > 0 && p(i).getDouble(2) > p(i - 1).getDouble(2)
    MatchRecognize.allRowsPerMatch(
        e, "user_id", "event_id", "D+ U+",
        Map("D" -> down, "U" -> up),
        includeCols = Seq("event_id", "value"))
      .orderBy($"user_id", $"event_id")
  }
  val qMatchRecognizeRowsSql: String =
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
         SELECT user_id, cls, min(rn) AS srn, max(rn) AS ern
         FROM r GROUP BY user_id, cls, grp),
       seq AS (
         SELECT *, lead(cls) OVER w AS ncls, lead(ern) OVER w AS nern
         FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY srn)),
       matches AS (
         SELECT user_id, srn, ern AS dern, nern,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY srn) AS BIGINT) AS match_number
         FROM seq WHERE cls = 'D' AND ncls = 'U')
       SELECT r.user_id, r.event_id, r.value, m.match_number,
         CASE WHEN r.rn <= m.dern THEN 'D' ELSE 'U' END AS classifier
       FROM r JOIN matches m
         ON r.user_id = m.user_id AND r.rn BETWEEN m.srn AND m.nern
       ORDER BY r.user_id, r.event_id"""

  val queries: Map[String, Q] = Map(
    "q_match_recognize" -> q_match_recognize _,
    "q_match_recognize_rows" -> q_match_recognize_rows _)

  val oracles: Map[String, String] = Map(
    "q_match_recognize" -> qMatchRecognizeSql,
    "q_match_recognize_rows" -> qMatchRecognizeRowsSql)
}
