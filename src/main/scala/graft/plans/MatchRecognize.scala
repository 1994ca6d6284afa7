package graft.plans

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** MATCH_RECOGNIZE as a DataFrame operator (SURVEY.md §2.5 — the "hardest
  * custom item"; reference plan node core/trino-main/src/main/java/io/trino/
  * sql/planner/plan/PatternRecognitionNode.java, execution
  * operator/window/matcher/Matcher.java:28).
  *
  * Physical shape — the secondary-sort pattern, not a per-group collect:
  * repartition by the partition key, sortWithinPartitions by (key, order),
  * then a single streaming pass detects group boundaries and buffers ONE
  * partition's rows at a time for the backtracking matcher. Spark's external
  * sorter handles the sort (spilling if needed), so executor memory bounds the
  * largest single pattern partition — the same contract as the reference,
  * whose WindowOperator buffers one partition in its PagesIndex
  * (reference: core/trino-main/src/main/java/io/trino/operator/PagesIndex.java:80).
  * At 100 TB with per-user partitions this is one shuffle, the minimum for any
  * order-sensitive per-key computation.
  *
  * Semantics implemented: ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST ROW
  * (or SKIP TO NEXT ROW), greedy quantifiers, alternation, DEFINE predicates
  * with full PREV/NEXT row access, measures over the match trace.
  */
object MatchRecognize {

  /** An output measure: name, Spark type, and evaluator over (partition rows,
    * match). Mirrors the reference's measure expressions (FIRST/LAST/
    * CLASSIFIER/count over the match). */
  final case class Measure(name: String, dataType: DataType,
      eval: (IndexedSeq[Row], RowPattern.PatternMatch) => Any)

  /** One row per match. `partitionCol` must be LongType (fixture keys are);
    * `orderCol` orders rows within a partition (total order recommended). */
  def oneRowPerMatch(
      df: DataFrame,
      partitionCol: String,
      orderCol: String,
      pattern: String,
      define: Map[String, RowPattern.Predicate],
      measures: Seq[Measure],
      skipPastLastRow: Boolean = true): DataFrame = {

    val pat = RowPattern.parse(pattern)
    val matcher = new RowPattern.Matcher(pat, define)
    val keyIdx = df.schema.fieldIndex(partitionCol)
    val keyField = df.schema(partitionCol)
    val outSchema = StructType(
      StructField(keyField.name, keyField.dataType, nullable = false) +:
        measures.map(m => StructField(m.name, m.dataType)))

    val n = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(n, col(partitionCol))
      .sortWithinPartitions(col(partitionCol), col(orderCol))
      .mapPartitions { it =>
        new Iterator[Seq[Row]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[Row] = {
            // buffer exactly one partition-key group (rows arrive sorted)
            val key = buf.head.getLong(keyIdx)
            val group = scala.collection.mutable.ArrayBuffer[Row]()
            while (buf.hasNext && buf.head.getLong(keyIdx) == key) group += buf.next()
            val part: IndexedSeq[Row] = group.toIndexedSeq
            matcher.findAll(part, skipPastLastRow).map { m =>
              Row.fromSeq(key +: measures.map(_.eval(part, m)))
            }
          }
        }.flatten
      }(Encoders.row(outSchema))
  }
}
