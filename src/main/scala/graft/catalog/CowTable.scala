package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal copy-on-write table format: the transactional target behind native
  * MERGE / UPDATE / DELETE (SURVEY.md §2.1; reference:
  * core/trino-main/src/main/java/io/trino/operator/MergeWriterOperator.java:48,
  * split/MergeProcessor — the reference mutates through connector-provided
  * transactional formats; this is that format, built Spark-first in the spirit
  * of the public Delta/Iceberg designs: immutable data files + versioned
  * manifests, commit = atomic manifest publish).
  *
  * Layout:
  * {{{
  *   <root>/data/part-<uuid>.parquet        immutable data files
  *   <root>/_manifests/v<N>.json            file list of snapshot N
  *   <root>/_manifests/CURRENT              latest version number
  * }}}
  *
  * Semantics:
  *  - Readers resolve a snapshot (latest or time-travel) and read ONLY its
  *    files — writers never mutate published files, so concurrent readers keep
  *    a consistent view (snapshot isolation for reads).
  *  - DELETE/UPDATE/MERGE are copy-on-write: the affected-file set is located
  *    with an `input_file_name()` probe (parquet pushdown makes the probe a
  *    pruned scan); only those files are rewritten, every other file is
  *    carried into the new manifest untouched — at 100 TB a point-ish MERGE
  *    rewrites a handful of files, not the table.
  *  - Commit is last-writer-wins via atomic CURRENT replace (single-writer
  *    discipline; the reference delegates the same concern to its connectors).
  */
final class CowTable private (root0: String, spark: SparkSession) {
  import CowTable._

  /** Absolute root: manifest paths must textually match the normalized
    * `input_file_name()` URIs used for copy-on-write file pruning. */
  val root: String = Paths.get(root0).toAbsolutePath.normalize.toString

  private def dataDir = Paths.get(root, "data")
  private def manifestDir = Paths.get(root, "_manifests")

  def currentVersion: Int =
    new String(Files.readAllBytes(manifestDir.resolve("CURRENT"))).trim.toInt

  private def manifestFiles(v: Int): Seq[String] = {
    val txt = new String(Files.readAllBytes(manifestDir.resolve(s"v$v.json")))
    // manifest is a JSON array of path strings
    "\"([^\"]+)\"".r.findAllMatchIn(txt).map(_.group(1)).toSeq
  }

  /** Snapshot read (latest, or a past version for time travel). */
  def read(asOfVersion: Option[Int] = None): DataFrame = {
    val files = manifestFiles(asOfVersion.getOrElse(currentVersion))
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Append-only insert: new files, no rewrites. */
  def insert(df: DataFrame): Unit = {
    val newFiles = writeData(df)
    commit(manifestFiles(currentVersion) ++ newFiles)
  }

  /** Copy-on-write DELETE. */
  def delete(cond: Column): Unit = {
    val affected = probeFiles(read().filter(cond))
    if (affected.nonEmpty) {
      val survivors = spark.read.parquet(affected: _*).filter(!cond)
      val rewritten = writeData(survivors)
      commit(manifestFiles(currentVersion).filterNot(affected.contains) ++ rewritten)
    }
  }

  /** Copy-on-write UPDATE: SET column -> expression where cond holds. */
  def update(cond: Column, set: Map[String, Column]): Unit = {
    val affected = probeFiles(read().filter(cond))
    if (affected.nonEmpty) {
      val base = spark.read.parquet(affected: _*)
      val updated = set.foldLeft(base) { case (df, (col0, expr0)) =>
        df.withColumn(col0, when(cond, expr0).otherwise(df(col0)))
      }
      val rewritten = writeData(updated)
      commit(manifestFiles(currentVersion).filterNot(affected.contains) ++ rewritten)
    }
  }

  /** Copy-on-write MERGE: upsert `source` on equality of `key`.
    * WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *. */
  def merge(source: DataFrame, key: String): Unit = {
    val cur = read()
    val affected = probeFiles(
      cur.join(source.select(key), Seq(key), "left_semi"))
    val untouched = manifestFiles(currentVersion).filterNot(affected.contains)
    // rewritten files: affected rows with matches replaced by source rows
    val rewritten =
      if (affected.isEmpty) Seq.empty
      else {
        val base = spark.read.parquet(affected: _*)
        writeData(base.join(source.select(key), Seq(key), "left_anti")
          .unionByName(source.join(base.select(key), Seq(key), "left_semi")))
      }
    // brand-new keys land in a fresh file
    val inserted = {
      val newRows = source.join(cur.select(key), Seq(key), "left_anti")
      if (newRows.isEmpty) Seq.empty else writeData(newRows)
    }
    commit(untouched ++ rewritten ++ inserted)
  }

  /** Which physical files hold at least one row of `matching`? */
  private def probeFiles(matching: DataFrame): Seq[String] =
    matching.select(input_file_name().as("f")).distinct()
      .collect().map(r => normalize(r.getString(0))).toSeq

  private def writeData(df: DataFrame): Seq[String] = {
    val tmp = Paths.get(root, s"_stage_${java.util.UUID.randomUUID()}")
    df.write.parquet(tmp.toString)
    val staged = Files.list(tmp).iterator()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (staged.hasNext) {
      val p = staged.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        val dest = dataDir.resolve(s"part-${java.util.UUID.randomUUID()}.parquet")
        Files.move(p, dest)
        out += dest.toString
      }
    }
    deleteRecursively(tmp)
    out.toSeq
  }

  private def commit(files: Seq[String]): Unit = {
    val v = currentVersion + 1
    val json = files.map(f => "\"" + f + "\"").mkString("[", ",\n ", "]")
    Files.write(manifestDir.resolve(s"v$v.json"), json.getBytes)
    val tmp = manifestDir.resolve(s"CURRENT.tmp${java.util.UUID.randomUUID()}")
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, manifestDir.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object CowTable {
  /** CREATE TABLE AS: materialize `df` as version 1. */
  def create(spark: SparkSession, root: String, df: DataFrame): CowTable = {
    val t = new CowTable(root, spark)
    Files.createDirectories(Paths.get(root, "data"))
    Files.createDirectories(Paths.get(root, "_manifests"))
    Files.write(Paths.get(root, "_manifests", "v0.json"), "[]".getBytes)
    Files.write(Paths.get(root, "_manifests", "CURRENT"), "0".getBytes)
    t.insert(df)
    t
  }

  def open(spark: SparkSession, root: String): CowTable = new CowTable(root, spark)

  /** input_file_name() returns a URI; manifests store plain paths. */
  private def normalize(uri: String): String =
    if (uri.startsWith("file:")) Paths.get(java.net.URI.create(uri)).toString else uri

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }
    Files.deleteIfExists(p)
  }
}
