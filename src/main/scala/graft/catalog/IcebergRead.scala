package graft.catalog

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Apache Iceberg v2 READ path over the open table spec (VERDICT r6
  * "what's missing" #4, the other half next to [[DeltaRead]]; reference:
  * plugin/trino-iceberg/ — IcebergMetadata/IcebergSplitManager; the FORMAT
  * is the public Iceberg table spec: `metadata/vN.metadata.json` →
  * current snapshot → manifest-LIST avro → manifest avro → data files).
  *
  * Zero-dependency: metadata JSON via json4s, manifests via the Avro
  * GenericDatumReader (both ship inside Spark — avro-1.12 jars), data files
  * via Spark's native parquet scan. Snapshot isolation is the load-bearing
  * behavior: only the CURRENT snapshot's manifest chain is read, so files
  * superseded by a rewrite remain on disk (and in older snapshots) without
  * being double-read; `snapshotId` gives time travel over the same
  * metadata, exactly the reference's `FOR VERSION AS OF`.
  *
  * Supported subset (all violations error loudly, never misread): format
  * versions 1/2, identity partition transforms, primitive column types,
  * data manifests and POSITIONAL delete manifests. v2 position deletes
  * (content=1: parquet files of (file_path, pos)) are applied as a
  * broadcast ANTI-JOIN against the scan's hidden (_metadata.file_path,
  * _metadata.row_index) — the delete set is tiny relative to data, so the
  * join broadcasts and the data side never shuffles, the same shape the
  * reference's reader applies per split (plugin/trino-iceberg
  * IcebergPageSourceProvider delete-filter path). Equality deletes
  * (content=2) are rejected rather than ignored.
  */
object IcebergRead {

  /** Files skipped by manifest-bounds pruning in the most recent plan on
    * this thread (observability for specs/EXPLAIN-style checks). */
  val lastPruned = new ThreadLocal[Integer] { override def initialValue(): Integer = 0 }


  /** Inclusive column-range prune hint: (column, lo, hi). Files whose
    * manifest bounds provably fall outside the range are skipped at PLAN
    * time — the reference's column-stats split pruning
    * (plugin/trino-iceberg IcebergSplitSource residual evaluation).
    * Files without recorded bounds are always kept (never wrong). */
  final case class Prune(column: String, lo: Option[Long], hi: Option[Long])

  def readTable(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None, prune: Option[Prune] = None,
      asOfTimestampMs: Option[Long] = None,
      metadataLocation: Option[String] = None): DataFrame = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    // metadataLocation: a CATALOG-provided pointer (the REST catalog's
    // LoadTableResult names the current metadata file directly — no
    // directory listing, the spec's contract); without one, fall back to
    // the hadoop-style newest-vN discovery
    val metaFile = metadataLocation.map { loc =>
      val f = new File(loc)
      require(f.isFile, s"metadata-location does not exist: $loc")
      f
    }.getOrElse {
      val metaDir = new File(tablePath, "metadata")
      require(metaDir.isDirectory, s"not an Iceberg table (no metadata/): $tablePath")
      Option(metaDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
        .sortBy(f => f.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
        .lastOption.getOrElse(throw new IllegalArgumentException(
          s"no vN.metadata.json under $metaDir"))
    }
    val meta = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(metaFile.toPath), "UTF-8"))

    val JInt(formatVersion) = (meta \ "format-version"): @unchecked
    require(formatVersion == 1 || formatVersion == 2,
      s"unsupported Iceberg format-version $formatVersion")

    // schema: current-schema-id → schemas[]; primitives only
    val JInt(schemaId) = (meta \ "current-schema-id"): @unchecked
    val JArray(schemas) = (meta \ "schemas"): @unchecked
    val schemaJson = schemas.find(s => (s \ "schema-id") == JInt(schemaId))
      .getOrElse(throw new IllegalArgumentException(s"schema-id $schemaId not found"))
    val JArray(fields) = (schemaJson \ "fields"): @unchecked
    val sparkSchema = StructType(fields.map { f =>
      val JString(name) = (f \ "name"): @unchecked
      val required = (f \ "required") == JBool(true)
      val tpe = (f \ "type") match {
        case JString(t) => icebergPrimitive(t)
        case other => throw new IllegalArgumentException(
          s"unsupported non-primitive Iceberg type for '$name': $other")
      }
      StructField(name, tpe, nullable = !required)
    })

    // Partition transforms: Iceberg v2 DATA files carry every source
    // column, so READING is transform-agnostic (hidden partitioning).
    // The spec fields matter for partition-value pruning: identity /
    // bucket[N] / truncate[W] / year/month/day prune below
    // ([[IcebergTransforms.mayMatch]]); other transforms (hour, void)
    // read fine but never prune — void carries no information by design.
    val specFields: Seq[(String, String, Int)] = (meta \ "partition-specs") match {
      case JArray(specs) => specs.flatMap { spec =>
        (spec \ "fields") match {
          case JArray(pfs) => pfs.map { pf =>
            val JString(transform) = (pf \ "transform"): @unchecked
            val JString(pname) = (pf \ "name"): @unchecked
            val sourceId = (pf \ "source-id") match {
              case JInt(sid) => sid.toInt
              case _ => -1
            }
            (pname, transform, sourceId)
          }
          case _ => Seq.empty
        }
      }
      case _ => Seq.empty
    }

    require(snapshotId.isEmpty || asOfTimestampMs.isEmpty,
      "snapshotId and asOfTimestampMs are mutually exclusive")
    // TIMESTAMP AS OF: newest snapshot-log entry at or before the instant
    // (the spec's snapshot-log [{timestamp-ms, snapshot-id}] history —
    // reference plugin/trino-iceberg IcebergUtil.getSnapshotIdAsOfTime)
    val timestampSnapshot: Option[BigInt] = asOfTimestampMs.map { ts =>
      val entries = (meta \ "snapshot-log") match {
        case JArray(xs) => xs.flatMap { e =>
          ((e \ "timestamp-ms"), (e \ "snapshot-id")) match {
            case (JInt(t), JInt(sid)) => Some((t.toLong, sid))
            case _ => None
          }
        }
        case _ => Nil
      }
      val eligible = entries.filter(_._1 <= ts)
      require(eligible.nonEmpty,
        s"no Iceberg snapshot at or before timestamp $ts in ${metaFile.getName}")
      eligible.maxBy(_._1)._2
    }
    val targetSnapshot: BigInt = snapshotId.map(BigInt(_))
      .orElse(timestampSnapshot).getOrElse {
      val JInt(cur) = (meta \ "current-snapshot-id"): @unchecked
      cur
    }
    val JArray(snapshots) = (meta \ "snapshots"): @unchecked
    val snap = snapshots.find(s => (s \ "snapshot-id") == JInt(targetSnapshot))
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $targetSnapshot not found in ${metaFile.getName}"))
    val JString(manifestList) = (snap \ "manifest-list"): @unchecked

    // manifest list avro → (data | positional-delete) manifest paths, each
    // with its DATA SEQUENCE NUMBER (v2 field; writers that equate sequence
    // and snapshot ids — ours included — fall back to added_snapshot_id)
    val (deleteManifests, dataManifests) =
      readAvro(resolve(tablePath, manifestList)).map { rec =>
        val content = Option(rec.get("content")).map(_.toString.toInt).getOrElse(0)
        require(content == 0 || content == 1,
          s"unsupported manifest content $content")
        val seq = Option(rec.getSchema.getField("sequence_number"))
          .flatMap(_ => Option(rec.get("sequence_number")))
          .orElse(Option(rec.get("added_snapshot_id")))
          .map(_.toString.toLong).getOrElse(0L)
        (content, rec.get("manifest_path").toString, seq)
      }.partition(_._1 == 1)

    // manifests → live files (status 2 = DELETED entries drop out);
    // expectedContent: 0 = data file, 1 = position-delete file (2 =
    // equality deletes rejected below)
    // prune target: column name -> (field id, is 8-byte long) from the
    // metadata schema; iceberg single-value binary is little-endian
    val pruneField: Option[(Int, Boolean)] = prune.map { pr =>
      val f = fields.find(f => (f \ "name") == JString(pr.column)).getOrElse(
        throw new IllegalArgumentException(s"prune column '${pr.column}' not in schema"))
      val JInt(fid) = (f \ "id"): @unchecked
      val JString(tn) = (f \ "type"): @unchecked
      require(tn == "long" || tn == "int" || tn == "date",
        s"prune supports long/int/date columns, got $tn")
      (fid.toInt, tn == "long")
    }
    def decodeBound(rec: GenericRecord, fieldName: String, fid: Int, isLong: Boolean): Option[Long] = {
      if (rec.getSchema.getField(fieldName) == null) return None
      rec.get(fieldName) match {
        case null => None
        case arr: java.util.Collection[_] =>
          arr.asScala.collectFirst {
            case kv: GenericRecord if kv.get("key").toString.toInt == fid =>
              val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
                .duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
              if (isLong) bb.getLong else bb.getInt.toLong
          }
        case _ => None
      }
    }

    var prunedFiles = 0
    /** (path, content, equality field ids, data sequence number) per live
      * entry. The entry's own sequence_number wins when present; null (the
      * ADDED-entry inheritance rule) takes the manifest's. */
    def liveFiles(manifests: Seq[(String, Long)],
        isDeleteManifest: Boolean): Seq[(String, Int, Seq[Int], Long)] =
      manifests.flatMap { case (mp, manifestSeq) =>
        readAvro(resolve(tablePath, mp)).flatMap { entry =>
          val entrySeq = Option(entry.getSchema.getField("sequence_number"))
            .flatMap(_ => Option(entry.get("sequence_number")))
            .map(_.toString.toLong).getOrElse(manifestSeq)
          val status = Option(entry.get("status")).map(_.toString.toInt).getOrElse(1)
          if (status == 2) None
          else {
            val df = entry.get("data_file").asInstanceOf[GenericRecord]
            val content = Option(df.get("content")).map(_.toString.toInt).getOrElse(0)
            if (isDeleteManifest)
              require(content == 1 || content == 2,
                s"file content $content in a delete manifest")
            else require(content == 0, s"file content $content in a data manifest")
            val format = df.get("file_format").toString
            require(format.equalsIgnoreCase("PARQUET"), s"unsupported file format $format")
            val eqIds: Seq[Int] =
              if (content == 2) {
                val f = df.getSchema.getField("equality_ids")
                require(f != null && df.get("equality_ids") != null,
                  "equality delete file without equality_ids")
                df.get("equality_ids").asInstanceOf[java.util.Collection[_]]
                  .asScala.map(_.toString.toInt).toSeq
              } else Seq.empty
            // plan-time file skipping, two independent evidences (either
            // alone suffices, mirroring the reference's split source):
            //  1. column-stats bounds provably missing the range
            //  2. the PARTITION VALUE under its transform (identity range,
            //     bucket equality, truncate range) — IcebergTransforms
            val pruned = content == 0 && (pruneField match {
              case Some((fid, isLong)) =>
                val lo = decodeBound(df, "lower_bounds", fid, isLong)
                val hi = decodeBound(df, "upper_bounds", fid, isLong)
                val statsMiss =
                  prune.get.hi.exists(h => lo.exists(_ > h)) ||
                  prune.get.lo.exists(l => hi.exists(_ < l))
                val partMiss = specFields.exists { case (pname, transform, sid) =>
                  sid == fid && df.getSchema.getField("partition") != null &&
                  (df.get("partition") match {
                    case pr: GenericRecord
                      if pr.getSchema.getField(pname) != null && pr.get(pname) != null =>
                      !IcebergTransforms.mayMatch(transform,
                        pr.get(pname).toString.toLong, prune.get.lo, prune.get.hi)
                    case _ => false // no partition value recorded: never prune
                  })
                }
                val miss = statsMiss || partMiss
                if (miss) prunedFiles += 1
                miss
              case None => false
            })
            if (pruned) None
            else Some((resolve(tablePath, df.get("file_path").toString),
              content, eqIds, entrySeq))
          }
        }
      }
    val dataEntries = liveFiles(dataManifests.map(m => (m._2, m._3)),
      isDeleteManifest = false)
    val dataFiles = dataEntries.map(_._1)
    val allDeletes = liveFiles(deleteManifests.map(m => (m._2, m._3)),
      isDeleteManifest = true)
    val deleteFiles = allDeletes.filter(_._2 == 1).map(_._1)
    val eqDeletes = allDeletes.filter(_._2 == 2)
    lastPruned.set(prunedFiles)
    if (dataFiles.isEmpty && prunedFiles > 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sparkSchema)
    require(dataFiles.nonEmpty, s"snapshot $targetSnapshot has no data files")
    val base = spark.read.schema(sparkSchema).parquet(dataFiles: _*)
    val afterPos = if (deleteFiles.isEmpty) base
    else {
      import org.apache.spark.sql.functions.{broadcast, col, regexp_replace}
      // position-delete spec columns: file_path (string URI as written by
      // the writer), pos (0-based row ordinal within that file). URI-scheme
      // spelling varies across writers — normalize both sides to a plain
      // absolute path before joining.
      def norm(c: org.apache.spark.sql.Column) =
        regexp_replace(c, "^file:/*", "/")
      val dels = spark.read.parquet(deleteFiles: _*)
        .select(norm(col("file_path")).as("_del_fp"), col("pos").as("_del_pos"))
      base
        .withColumn("_ib_fp", norm(col("_metadata.file_path")))
        .withColumn("_ib_pos", col("_metadata.row_index"))
        .join(broadcast(dels),
          col("_ib_fp") === col("_del_fp") && col("_ib_pos") === col("_del_pos"),
          "left_anti")
        .drop("_ib_fp", "_ib_pos")
    }
    if (eqDeletes.isEmpty) afterPos
    else {
      import org.apache.spark.sql.functions.{broadcast, col, lit, max, regexp_replace}
      // EQUALITY deletes (content=2): each file's rows name forbidden value
      // tuples over `equality_ids` columns — applied as a broadcast
      // null-safe anti-join per distinct id set (the reference builds the
      // same filter in IcebergPageSourceProvider), SCOPED BY SEQUENCE
      // NUMBER per the v2 spec: a delete with data sequence number S
      // applies only to data files with sequence number STRICTLY BELOW S,
      // so a row re-appended after the delete survives it. Both side maps
      // (data file → seq, delete tuple → max seq) are manifest-sized
      // broadcasts — O(files), never O(rows), at any scale.
      val idToName = fields.map { f =>
        val JInt(fid) = (f \ "id"): @unchecked
        val JString(name) = (f \ "name"): @unchecked
        fid.toInt -> name
      }.toMap
      def normS(p: String) = p.replaceFirst("^file:/*", "/")
      def normC(c: org.apache.spark.sql.Column) = regexp_replace(c, "^file:/*", "/")
      val seqSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_ib_fp2",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_ib_dseq",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val seqDf = spark.createDataFrame(java.util.List.of(
        dataEntries.map(e =>
          org.apache.spark.sql.Row(normS(e._1), e._4)): _*), seqSchema)
      val withSeq = afterPos
        .withColumn("_ib_fp2", normC(col("_metadata.file_path")))
        .join(broadcast(seqDf), Seq("_ib_fp2"))
      val applied = eqDeletes.groupBy(_._3).foldLeft(withSeq) {
        case (acc, (ids, files)) =>
          val cols = ids.map(id => idToName.getOrElse(id,
            throw new IllegalArgumentException(s"equality_ids field $id not in schema")))
          // forbidden tuple → the NEWEST sequence that forbids it; a data
          // row dies iff its tuple matches AND that sequence is newer than
          // the row's file
          val dels = files.map { case (p, _, _, dseq) =>
            spark.read.parquet(p)
              .select(cols.map(c => col(c).as(s"_eq_$c")) :+
                lit(dseq).as("_eq_seq"): _*)
          }.reduce(_ unionByName _)
            .groupBy(cols.map(c => col(s"_eq_$c")): _*)
            .agg(max(col("_eq_seq")).as("_eq_seq"))
          val cond = cols.map(c => acc(c) <=> col(s"_eq_$c"))
            .reduce(_ && _) && col("_eq_seq") > acc("_ib_dseq")
          acc.join(broadcast(dels), cond, "left_anti")
      }
      applied.drop("_ib_fp2", "_ib_dseq")
    }
  }

  private def icebergPrimitive(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "date" => DateType
    case "string" => StringType
    case "binary" => BinaryType
    case "timestamp" | "timestamptz" => TimestampType
    case d if d.startsWith("decimal(") =>
      val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalArgumentException(s"unsupported Iceberg type '$other'")
  }

  /** Iceberg metadata stores absolute or table-relative URIs; accept both. */
  private def resolve(tablePath: String, p: String): String = {
    val stripped = p.stripPrefix("file:")
    if (new File(stripped).isAbsolute) stripped else s"$tablePath/$stripped"
  }

  private def readAvro(path: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](
      new File(path), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector
    finally reader.close()
  }
}
