package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** DataFrame-over-InternalRow-RDD bridge.
  *
  * Spark 4 keeps `internalCreateDataFrame` private[sql]; a library that
  * materializes a plan's RDD once (persist with lineage INTACT — the
  * fault-tolerant spelling of Dataset.localCheckpoint, whose blocks are
  * non-replayable) needs this seam to wrap the persisted RDD back into a
  * DataFrame. Same one-file-subpackage pattern as ColumnBridge. */
object DataFrameBridge {
  def internalCreate(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
