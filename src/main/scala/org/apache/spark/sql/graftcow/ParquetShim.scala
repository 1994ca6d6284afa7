package org.apache.spark.sql.graftcow

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Thin access shim into Spark's own DSv2 parquet reading stack (this
  * package placement is only for `private[spark]`/`private[sql]` visibility;
  * no Spark behavior is modified).
  *
  * graft's CoW DSv2 table (graft.catalog.CowDsv2) plans its OWN input
  * partitions — one per hash bucket, straight from the table's manifest — but
  * delegates all per-file parquet mechanics (vectorized reader, predicate
  * pushdown, partition-value appending, InputFileBlockHolder bookkeeping) to
  * the standard `ParquetPartitionReaderFactory`. The factory is obtained from
  * a throwaway `ParquetScan` so every hadoop-conf knob (requested-schema
  * JSON, timezone, int96 rebase, nanosAsLong, …) is set by Spark's own
  * `createReaderFactory` code rather than a hand-maintained copy.
  */
object ParquetShim {

  /** A PartitionReaderFactory reading `readDataSchema` (+ appended
    * `readPartitionSchema` values) from parquet files whose on-disk columns
    * are `dataSchema`, with `filters` pushed into row-group/page pruning.
    * The returned factory expects `FilePartition` input partitions. */
  def parquetReaderFactory(
      spark: SparkSession,
      dataSchema: StructType,
      readDataSchema: StructType,
      readPartitionSchema: StructType,
      filters: Array[Filter]): PartitionReaderFactory = {
    val hadoopConf: Configuration =
      spark.sessionState.newHadoopConfWithOptions(Map.empty)
    val emptyIndex =
      new InMemoryFileIndex(spark, Nil, Map.empty, None)
    ParquetScan(
      spark,
      hadoopConf,
      emptyIndex,
      dataSchema,
      readDataSchema,
      readPartitionSchema,
      filters,
      CaseInsensitiveStringMap.empty(),
      None,
      Nil,
      Nil,
      Array.empty
    ).createReaderFactory()
  }
}
