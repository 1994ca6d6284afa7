package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField, StructType}

/** Delta Lake READ path over the open delta-log protocol (VERDICT r6
  * "what's missing" #4; reference: plugin/trino-delta-lake/ — notably
  * transactionlog/TransactionLogAccess.java and DeltaLakeSplitManager; the
  * PROTOCOL itself is the public Delta Lake spec: `_delta_log/` holds
  * ordered versions `%020d.json`, each a line-JSON sequence of
  * `metaData` / `add` / `remove` actions; PARQUET CHECKPOINTS compact the
  * prefix — `_last_checkpoint` points at `%020d.checkpoint.parquet` (or the
  * multi-part `%020d.checkpoint.%010d.%010d.parquet` family) whose rows are
  * the same actions in columnar form; the live table = checkpoint state +
  * last-writer-wins replay of the JSON suffix).
  *
  * Zero-dependency by design: the log is parsed with json4s (ships inside
  * Spark), checkpoints with Spark's own parquet reader, the schema is
  * Delta's OWN Spark-schema JSON (`DataType.fromJson` reads `schemaString`
  * directly), and the data files are plain parquet read by Spark's native
  * scan — so pushdown/pruning over the data files is stock Catalyst.
  * Partition columns come from each add-action's `partitionValues`,
  * attached as typed literals per file group — the same partition-pruning
  * shape the reference's split manager produces.
  *
  * Scale: log replay is driver-side METADATA work, bounded by (checkpoint
  * rows + JSON suffix) — every Delta reader holds this state (the
  * reference caches it per-snapshot). Data reading is fully distributed.
  * Supported subset: classic single- and multi-part parquet checkpoints,
  * V2 UUID checkpoints (json or parquet manifest + `_sidecars/` parquets,
  * validated against Databricks-written fixtures) + complete JSON suffix;
  * protocol reader versions 1-2 and version 3 when every listed reader
  * feature is implemented (currently: columnMapping); column mapping mode
  * NAME (physical-name reads projected to the logical schema) and mode ID
  * (parquet field-id resolution via Spark's fieldId read path); DELETION
  * VECTORS on JSON-commit adds ('u' and 'p' storage — decoded by
  * [[DeltaDeletionVectors]], applied as one broadcast anti-join on
  * (_metadata.file_path, row_index)) — 'u', 'p' AND inline 'i' storage
  * (the reference refuses 'i'; the open spec defines it). Vectors living
  * only in CHECKPOINTED adds stay a documented refusal. */
object DeltaRead {

  private[catalog] final case class Add(path: String, partitionValues: Map[String, String],
      dv: Option[DeltaDeletionVectors.Descriptor] = None)

  private[catalog] final class State {
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Seq.empty
    val active = scala.collection.mutable.LinkedHashMap[String, Add]()

    def protocolGuard(minReader: BigInt, features: Seq[String]): Unit = {
      // reader version 2 = column mapping (both modes implemented here);
      // version 3 = table features — acceptable only when every listed
      // reader feature is one this reader implements
      val understood = Set("columnMapping", "deletionVectors", "v2Checkpoint")
      if (minReader > 3) throw new IllegalArgumentException(
        s"Delta minReaderVersion $minReader is not supported by this reader")
      if (minReader == 3) {
        val unknown = features.filterNot(understood)
        if (unknown.nonEmpty) throw new IllegalArgumentException(
          s"Delta readerFeatures ${unknown.mkString("[", ", ", "]")} " +
            "are not supported by this reader")
      }
    }
    var columnMappingMode: String = "none"
    def columnMappingGuard(mode: Option[String]): Unit = mode match {
      case Some("name") => columnMappingMode = "name"
      case Some("id") => columnMappingMode = "id"
      case Some(m) if m != "none" => throw new IllegalArgumentException(
        s"Delta column mapping mode '$m' is not supported by this reader " +
          "(only 'none', 'name' and 'id')")
      case Some(_) => columnMappingMode = "none"
      case None =>
    }
    def add(path: String, pv: Map[String, String],
        dv: Option[DeltaDeletionVectors.Descriptor]): Unit = {
      val decoded = PathCodec.unescape(path)
      active(decoded) = Add(decoded, pv, dv)
    }
    def remove(path: String): Unit =
      active.remove(PathCodec.unescape(path))
  }

  /** Apply one JSON commit line. */
  private def applyLine(st: State, line: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.parse(line)
    json \ "protocol" match {
      case JObject(_) =>
        (json \ "protocol" \ "minReaderVersion") match {
          case JInt(v) =>
            val features = (json \ "protocol" \ "readerFeatures") match {
              case JArray(fs) => fs.collect { case JString(f) => f }
              case _ => Seq.empty
            }
            st.protocolGuard(v, features)
          case _ =>
        }
      case _ =>
    }
    json \ "metaData" match {
      case JObject(_) =>
        (json \ "metaData" \ "schemaString") match {
          case JString(s) => st.schemaJson = Some(s)
          case _ =>
        }
        (json \ "metaData" \ "partitionColumns") match {
          case JArray(cols) => st.partCols = cols.collect { case JString(c) => c }
          case _ =>
        }
        st.columnMappingGuard(
          (json \ "metaData" \ "configuration" \ "delta.columnMapping.mode") match {
            case JString(mode) => Some(mode)
            case _ => None
          })
      case _ =>
    }
    json \ "add" match {
      case JObject(_) =>
        val JString(path) = (json \ "add" \ "path"): @unchecked
        val pv = (json \ "add" \ "partitionValues") match {
          case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
          case _ => Map.empty[String, String]
        }
        // deletion vector descriptor (delta PROTOCOL.md): a re-add of the
        // same path with a new DV supersedes via last-writer-wins above
        val dv = (json \ "add" \ "deletionVector") match {
          case JObject(_) =>
            val JString(st0) = (json \ "add" \ "deletionVector" \ "storageType"): @unchecked
            val JString(pdv) = (json \ "add" \ "deletionVector" \ "pathOrInlineDv"): @unchecked
            val off = (json \ "add" \ "deletionVector" \ "offset") match {
              case JInt(o) => Some(o.toInt)
              case _ => None
            }
            val JInt(sz) = (json \ "add" \ "deletionVector" \ "sizeInBytes"): @unchecked
            val JInt(card) = (json \ "add" \ "deletionVector" \ "cardinality"): @unchecked
            Some(DeltaDeletionVectors.Descriptor(st0, pdv, off, sz.toInt, card.toLong))
          case _ => None
        }
        st.add(path, pv, dv)
      case _ =>
    }
    json \ "remove" match {
      case JObject(_) =>
        val JString(path) = (json \ "remove" \ "path"): @unchecked
        st.remove(path)
      case _ =>
    }
  }

  /** Load a classic parquet checkpoint (1 or N parts) into the state. */
  private def applyCheckpoint(spark: SparkSession, st: State, files: Seq[File]): Unit = {
    val cp = spark.read.parquet(files.map(_.getAbsolutePath): _*)
    val cols = cp.schema.fieldNames.toSet
    def struct(name: String): Option[StructType] =
      if (cols.contains(name)) Some(cp.schema(name).dataType.asInstanceOf[StructType]) else None

    struct("protocol").foreach { ps =>
      val hasFeatures = ps.fieldNames.contains("readerFeatures")
      cp.where(col("protocol").isNotNull).collect().foreach { r =>
        val p = r.getStruct(r.fieldIndex("protocol"))
        val mrv = p.get(p.fieldIndex("minReaderVersion")) match {
          case i: Int => BigInt(i)
          case l: Long => BigInt(l)
          case null => BigInt(1)
        }
        val features =
          if (hasFeatures && !p.isNullAt(p.fieldIndex("readerFeatures")))
            p.getSeq[String](p.fieldIndex("readerFeatures"))
          else Seq.empty
        st.protocolGuard(mrv, features)
      }
    }
    struct("metaData").foreach { ms =>
      cp.where(col("metaData").isNotNull).collect().foreach { r =>
        val m = r.getStruct(r.fieldIndex("metaData"))
        Option(m.getAs[String]("schemaString")).foreach(s => st.schemaJson = Some(s))
        if (ms.fieldNames.contains("partitionColumns") &&
            !m.isNullAt(m.fieldIndex("partitionColumns")))
          st.partCols = m.getSeq[String](m.fieldIndex("partitionColumns"))
        if (ms.fieldNames.contains("configuration") &&
            !m.isNullAt(m.fieldIndex("configuration")))
          st.columnMappingGuard(
            m.getMap[String, String](m.fieldIndex("configuration"))
              .get("delta.columnMapping.mode"))
      }
    }
    struct("add").foreach { as =>
      val hasDv = as.fieldNames.contains("deletionVector")
      val cols = Seq(col("add.path"), col("add.partitionValues")) ++
        (if (hasDv) Seq(col("add.deletionVector")) else Seq.empty)
      cp.where(col("add").isNotNull).select(cols: _*)
        .collect().foreach { r =>
          val pv = Option(r.getMap[String, String](1)).map(_.toMap)
            .getOrElse(Map.empty[String, String])
          // checkpointed DV descriptors replay exactly like JSON-commit ones
          val dv = if (hasDv && !r.isNullAt(2)) {
            val d = r.getStruct(2)
            def fs(n: String) = d.getAs[String](n)
            Some(DeltaDeletionVectors.Descriptor(
              fs("storageType"), fs("pathOrInlineDv"),
              if (d.schema.fieldNames.contains("offset") &&
                !d.isNullAt(d.fieldIndex("offset")))
                Some(d.getInt(d.fieldIndex("offset"))) else None,
              d.getInt(d.fieldIndex("sizeInBytes")),
              d.getLong(d.fieldIndex("cardinality"))))
          } else None
          st.add(r.getString(0), pv, dv)
        }
    }
    // checkpoint `remove` rows are vacuum tombstones for paths no longer in
    // the add set — nothing to subtract from the reconstructed state
  }

  /** V2 (UUID) checkpoint: `_last_checkpoint.v2Checkpoint` names a manifest
    * `N.checkpoint.<uuid>.{json,parquet}` whose file actions live in SIDECAR
    * parquets under `_delta_log/_sidecars/` (Databricks-written fixtures in
    * the reference's public test resources validate all three shapes: json
    * manifest, parquet manifest, multipart sidecars). The pointer may inline
    * `nonFileActions` + `sidecarFiles`; otherwise the manifest supplies
    * them. */
  private def applyV2Checkpoint(spark: SparkSession, st: State, logDir: File,
      v2: org.json4s.JValue): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val JString(manifestRel) = (v2 \ "path"): @unchecked
    val manifest = new File(logDir, manifestRel)
    require(manifest.isFile, s"v2 checkpoint manifest not found: $manifest")
    val pointerSidecars: Option[Seq[String]] = (v2 \ "sidecarFiles") match {
      case JArray(xs) => Some(xs.map { s =>
        val JString(p) = (s \ "path"): @unchecked; p
      })
      case _ => None
    }
    val pointerActions: Option[Seq[JValue]] = (v2 \ "nonFileActions") match {
      case JArray(xs) => Some(xs)
      case _ => None
    }
    val sidecarPaths: Seq[String] = (pointerActions, pointerSidecars) match {
      case (Some(actions), Some(sidecars)) =>
        actions.foreach(a =>
          applyLine(st, JsonMethods.compact(JsonMethods.render(a))))
        sidecars
      case _ if manifest.getName.endsWith(".json") =>
        val sc = Seq.newBuilder[String]
        Files.readAllLines(manifest.toPath, StandardCharsets.UTF_8).forEach { line =>
          if (line.trim.nonEmpty) {
            (JsonMethods.parse(line) \ "sidecar" \ "path") match {
              case JString(p) => sc += p
              case _ => applyLine(st, line) // protocol/metaData/add/remove…
            }
          }
        }
        sc.result()
      case _ =>
        // parquet manifest: non-file (and any embedded file) actions go
        // through the classic columnar loader; sidecar refs read separately
        applyCheckpoint(spark, st, Seq(manifest))
        val df = spark.read.parquet(manifest.getAbsolutePath)
        if (df.schema.fieldNames.contains("sidecar"))
          df.where(org.apache.spark.sql.functions.col("sidecar").isNotNull)
            .select("sidecar.path").collect().map(_.getString(0)).toSeq
        else Seq.empty
    }
    val sidecarFiles = sidecarPaths.map(p => new File(new File(logDir, "_sidecars"), p))
    sidecarFiles.foreach(f => require(f.isFile, s"v2 checkpoint sidecar not found: $f"))
    if (sidecarFiles.nonEmpty) applyCheckpoint(spark, st, sidecarFiles)
  }

  /** Replay checkpoint + JSON suffix into live state (shared by the plan
    * builder and the deletion-vector writer). `asOfVersion` truncates the
    * replay at that commit (Delta time travel, reference
    * plugin/trino-delta-lake TableSnapshot.load at a given version): when
    * the version predates the checkpoint the JSON history is replayed from
    * version 0 instead — failing loudly if the log was cleaned. */
  private[catalog] def replayState(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): State = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val logDir = new File(tablePath, "_delta_log")
    require(logDir.isDirectory, s"not a Delta table (no _delta_log): $tablePath")
    val logFiles = Option(logDir.listFiles()).getOrElse(Array.empty)
    val allJson = logFiles
      .filter(_.getName.matches("\\d{20}\\.json")).sortBy(_.getName)
    asOfVersion.foreach { v =>
      require(allJson.exists(_.getName.stripSuffix(".json").toLong == v) ||
          logFiles.exists(_.getName.startsWith(f"$v%020d.checkpoint")),
        s"Delta version $v does not exist in $logDir")
    }
    val jsonVersions = asOfVersion match {
      case Some(v) => allJson.filter(_.getName.stripSuffix(".json").toLong <= v)
      case None => allJson
    }

    val st = new State
    val lastCp0 = new File(logDir, "_last_checkpoint")
    // time travel to a pre-checkpoint version: replay JSON from 0 instead
    val lastCp = if (lastCp0.exists() && asOfVersion.exists { v =>
        import org.json4s._
        (JsonMethods.parse(new String(Files.readAllBytes(lastCp0.toPath),
          StandardCharsets.UTF_8)) \ "version") match {
          case JInt(cpv) => cpv.toLong > v
          case _ => false
        }
      }) {
      require(jsonVersions.headOption.exists(_.getName == "0" * 20 + ".json"),
        s"Delta time travel to version ${asOfVersion.get} needs the JSON log " +
          "from version 0, which has been cleaned")
      new File(logDir, "__no_checkpoint__")
    } else lastCp0
    val fromVersion: Long =
      if (lastCp.exists()) {
        // classic checkpoint: `_last_checkpoint` = {"version":N[,"parts":P]}
        val cpJson = JsonMethods.parse(
          new String(Files.readAllBytes(lastCp.toPath), StandardCharsets.UTF_8))
        val version = (cpJson \ "version") match {
          case JInt(v) => v.toLong
          case other => throw new IllegalArgumentException(
            s"_last_checkpoint without a version: $other")
        }
        val parts = (cpJson \ "parts") match {
          case JInt(p) => Some(p.toInt)
          case _ => None
        }
        (cpJson \ "v2Checkpoint") match {
          case v2: JObject =>
            applyV2Checkpoint(spark, st, logDir, v2)
          case _ =>
            val cpFiles = parts match {
              case Some(p) => (1 to p).map(i =>
                new File(logDir, f"$version%020d.checkpoint.$i%010d.$p%010d.parquet"))
              case None => Seq(new File(logDir, f"$version%020d.checkpoint.parquet"))
            }
            val missing = cpFiles.filterNot(_.isFile)
            if (missing.nonEmpty) throw new IllegalArgumentException(
              s"checkpoint file(s) ${missing.map(_.getName).mkString(", ")} not found " +
                "(and _last_checkpoint names no v2Checkpoint)")
            applyCheckpoint(spark, st, cpFiles)
        }
        version + 1
      } else {
        require((lastCp ne lastCp0) ||
            !logFiles.exists(_.getName.contains(".checkpoint.")),
          "Delta checkpoint files without a _last_checkpoint pointer are not " +
            "supported by this reader")
        require(jsonVersions.nonEmpty, s"empty Delta log: $tablePath")
        require(jsonVersions.head.getName == "0" * 20 + ".json",
          s"Delta log does not start at version 0 (earliest: ${jsonVersions.head.getName}); " +
            "a log-cleaned table without a checkpoint cannot be replayed by this reader")
        0L
      }

    // the JSON suffix must be contiguous from `fromVersion`
    val suffix = jsonVersions
      .filter(_.getName.stripSuffix(".json").toLong >= fromVersion)
    suffix.map(_.getName.stripSuffix(".json").toLong)
      .zipWithIndex.foreach { case (v, i) =>
        require(v == fromVersion + i, s"Delta log has a gap before version $v")
      }
    for (vf <- suffix;
         line <- Files.readAllLines(vf.toPath, StandardCharsets.UTF_8).asScala
         if line.trim.nonEmpty)
      applyLine(st, line)
    st
  }

  /** Live adds (relative path, partition values, deletion vector) plus the
    * logical schema — the metadata the DV writer needs. */
  private[catalog] def activeAdds(spark: SparkSession, tablePath: String):
      (StructType, Seq[(String, Map[String, String],
        Option[DeltaDeletionVectors.Descriptor])]) = {
    val st = replayState(spark, tablePath)
    val schema = DataType.fromJson(st.schemaJson.getOrElse(
      throw new IllegalArgumentException("Delta log has no metaData action")))
      .asInstanceOf[StructType]
    (schema, st.active.values.toSeq.map(a => (a.path, a.partitionValues, a.dv)))
  }

  def readTable(spark: SparkSession, tablePath: String): DataFrame =
    readTable(spark, tablePath, asOfVersion = None, asOfTimestampMs = None)

  /** Time-travel read (reference queryPeriod on Delta tables): VERSION is
    * the commit version; TIMESTAMP resolves to the newest commit whose
    * file modification time is ≤ the instant — the Delta protocol's
    * commit-timestamp rule for ICT-less tables. */
  def readTable(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long], asOfTimestampMs: Option[Long]): DataFrame = {
    require(asOfVersion.isEmpty || asOfTimestampMs.isEmpty,
      "FOR VERSION AS OF and FOR TIMESTAMP AS OF are mutually exclusive")
    val version = asOfVersion.orElse(asOfTimestampMs.map { ts =>
      val logDir = new File(tablePath, "_delta_log")
      val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("\\d{20}\\.json"))
        .filter(_.lastModified() <= ts)
        .map(_.getName.stripSuffix(".json").toLong)
      require(commits.nonEmpty,
        s"no Delta commit at or before timestamp $ts in $tablePath")
      commits.max
    })
    val st = replayState(spark, tablePath, version)
    val schema = DataType.fromJson(st.schemaJson.getOrElse(
      throw new IllegalArgumentException("Delta log has no metaData action")))
      .asInstanceOf[StructType]
    // Column mapping mode 'name': parquet files carry PHYSICAL column
    // names recorded per-field in the schema metadata
    // (delta.columnMapping.physicalName); read physically, project back to
    // logical names. Mode 'id': parquet files carry FIELD IDS
    // (delta.columnMapping.id) — the read schema keeps the LOGICAL names
    // but annotates each field with `parquet.field.id`, and Spark's
    // field-id resolution (spark.sql.parquet.fieldId.read.enabled, pinned
    // on in GraftSession) matches columns by id regardless of their
    // physical names.
    val physicalOf: Map[String, String] =
      if (st.columnMappingMode == "name")
        schema.fields.map { f =>
          val pn = if (f.metadata.contains("delta.columnMapping.physicalName"))
            f.metadata.getString("delta.columnMapping.physicalName")
          else throw new IllegalArgumentException(
            s"column mapping mode 'name' but field '${f.name}' has no physicalName")
          f.name -> pn
        }.toMap
      else if (st.columnMappingMode == "id")
        // partitionValues stay keyed by the PHYSICAL name under id mapping
        // too; data columns resolve by field id, so logical names pass through
        schema.fields.map { f =>
          f.name -> (if (f.metadata.contains("delta.columnMapping.physicalName"))
            f.metadata.getString("delta.columnMapping.physicalName") else f.name)
        }.toMap
      else schema.fieldNames.map(n => n -> n).toMap

    val dataSchema =
      if (st.columnMappingMode == "id")
        StructType(schema.fields.filterNot(f => st.partCols.contains(f.name)).map { f =>
          require(f.metadata.contains("delta.columnMapping.id"),
            s"column mapping mode 'id' but field '${f.name}' has no columnMapping.id")
          val fid = f.metadata.getLong("delta.columnMapping.id")
          StructField(f.name, f.dataType, f.nullable,
            new MetadataBuilder().putLong("parquet.field.id", fid).build())
        })
      else StructType(schema.fields.filterNot(f => st.partCols.contains(f.name))
        .map(f => StructField(physicalOf(f.name), f.dataType, f.nullable)))

    if (st.active.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

    // deletion vectors: decode each file's bitmap (driver-side — the same
    // metadata-scale state the reference's page source materializes per
    // split) into (absolute file path, deleted row position) pairs, applied
    // below as ONE broadcast anti-join on (_metadata.file_path, row_index)
    val dvPairs: Seq[(String, Long)] = st.active.values.toSeq.flatMap { a =>
      a.dv.toSeq.flatMap { d =>
        val abs = new File(s"$tablePath/${a.path}").getAbsolutePath
        DeltaDeletionVectors.read(tablePath, d).map(pos => (abs, pos))
      }
    }
    val hasDv = dvPairs.nonEmpty

    // one native parquet scan per partition-value group, typed literals for
    // the partition columns, union preserving the declared column order
    val groups = st.active.values.toSeq.groupBy(_.partitionValues)
    val unioned = groups.map { case (pv, adds) =>
      val base0 = spark.read.schema(dataSchema)
        .parquet(adds.map(a => s"$tablePath/${a.path}"): _*)
      // physical → logical projection for the data columns (id mode reads
      // under the logical names already — field ids did the matching);
      // with deletion vectors the scan's row identity rides along
      val dataCols = schema.fields.filterNot(f => st.partCols.contains(f.name))
        .map(f => col(if (st.columnMappingMode == "id") f.name else physicalOf(f.name))
          .as(f.name)).toIndexedSeq
      val withId =
        if (hasDv) dataCols ++ Seq(
          col("_metadata.file_path").as("_dv_fp"),
          col("_metadata.row_index").as("_dv_pos"))
        else dataCols
      val base = base0.select(withId: _*)
      val keep = schema.fieldNames.toIndexedSeq ++
        (if (hasDv) Seq("_dv_fp", "_dv_pos") else Seq.empty)
      st.partCols.foldLeft(base) { (df, pc) =>
        val tpe = schema(pc).dataType
        // add-action partitionValues are keyed by PHYSICAL name under mapping
        val v = pv.get(physicalOf(pc)).orElse(pv.get(pc)).orNull
        df.withColumn(pc, lit(v).cast(tpe))
      }.select(keep.map(col): _*)
    }.reduce(_ unionByName _)

    if (!hasDv) unioned
    else {
      import org.apache.spark.sql.functions.{broadcast, regexp_replace}
      val dels = spark.createDataFrame(dvPairs.map(p => Row(p._1, p._2)).asJava,
        StructType(Seq(StructField("_del_fp", org.apache.spark.sql.types.StringType),
          StructField("_del_pos", org.apache.spark.sql.types.LongType))))
      def norm(c: org.apache.spark.sql.Column) = regexp_replace(c, "^file:/*", "/")
      unioned
        .join(broadcast(dels),
          norm(col("_dv_fp")) === norm(col("_del_fp")) &&
            col("_dv_pos") === col("_del_pos"),
          "left_anti")
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }
}
