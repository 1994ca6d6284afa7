package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg interop query (reader: graft.catalog.IcebergRead). The fixture is
  * a real Iceberg v2 table layout authored action-by-action against the
  * public spec — metadata JSON with TWO snapshots, avro manifest lists, avro
  * manifests (with a status=2 DELETED entry the reader must drop). Snapshot
  * 2 (current) rewrites region 2's file to exclude keys >= 10; snapshot 1
  * still references the original file, so the query exercises BOTH snapshot
  * isolation (stale file on disk, never double-read) and time travel (the
  * prev_n column counts snapshot 1). */
object IcebergQueries {

  private val entrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
         {"name":"status","type":"int"},
         {"name":"snapshot_id","type":["null","long"],"default":null},
         {"name":"data_file","type":{"type":"record","name":"data_file_r","fields":[
           {"name":"content","type":"int"},
           {"name":"file_path","type":"string"},
           {"name":"file_format","type":"string"},
           {"name":"record_count","type":"long"},
           {"name":"file_size_in_bytes","type":"long"},
           {"name":"lower_bounds","type":["null",{"type":"array","items":
             {"type":"record","name":"k_v_lo","fields":[
               {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null},
           {"name":"upper_bounds","type":["null",{"type":"array","items":
             {"type":"record","name":"k_v_hi","fields":[
               {"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null},
           {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""")

  private val listSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
         {"name":"manifest_path","type":"string"},
         {"name":"manifest_length","type":"long"},
         {"name":"partition_spec_id","type":"int"},
         {"name":"content","type":"int"},
         {"name":"added_snapshot_id","type":"long"}]}""")

  private def writeAvro(dest: File, schema: Schema, records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, dest)
    try records.foreach(w.append) finally w.close()
  }

  /** Iceberg single-value serialization for long: 8-byte little-endian. */
  private def leLong(v: Long): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(v); bb.flip(); bb
  }

  private def entry(status: Int, path: String, rows: Long,
      content: Int = 0, bounds: Map[Int, (Long, Long)] = Map.empty,
      equalityIds: Seq[Int] = Seq.empty): GenericRecord = {
    val df = new GenericData.Record(entrySchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", path)
    df.put("file_format", "PARQUET")
    df.put("record_count", rows)
    df.put("file_size_in_bytes", 1L)
    if (bounds.nonEmpty) {
      val dfSchema = entrySchema.getField("data_file").schema()
      def kvArr(fieldName: String, pick: ((Long, Long)) => Long): java.util.List[GenericRecord] = {
        val arrSchema = dfSchema.getField(fieldName).schema().getTypes.get(1)
        val kvSchema = arrSchema.getElementType
        val out = new java.util.ArrayList[GenericRecord]()
        bounds.toSeq.sortBy(_._1).foreach { case (id, b) =>
          val kv = new GenericData.Record(kvSchema)
          kv.put("key", id); kv.put("value", leLong(pick(b)))
          out.add(kv)
        }
        out
      }
      df.put("lower_bounds", kvArr("lower_bounds", _._1))
      df.put("upper_bounds", kvArr("upper_bounds", _._2))
    }
    if (equalityIds.nonEmpty)
      df.put("equality_ids", java.util.Arrays.asList(equalityIds.map(Int.box): _*))
    val e = new GenericData.Record(entrySchema)
    e.put("status", status)
    e.put("snapshot_id", null)
    e.put("data_file", df)
    e
  }

  private def manifestRef(path: String, snapshotId: Long,
      content: Int = 0): GenericRecord = {
    val m = new GenericData.Record(listSchema)
    m.put("manifest_path", path)
    m.put("manifest_length", 1L)
    m.put("partition_spec_id", 0)
    m.put("content", content)
    m.put("added_snapshot_id", snapshotId)
    m
  }

  private def buildIcebergNation(s: SparkSession, dir: String): String = {
    import s.implicits._
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_nation_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    // generation marker: bumped whenever the fixture layout grows (bounds
    // added round 8) so older cached builds rebuild
    if (new File(root, "metadata/v1.metadata.json").exists() &&
        new File(root, "metadata/.gen-eqseq5").exists())
      return root.getAbsolutePath
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(root)
    new File(root, "metadata").mkdirs()
    new File(root, "data").mkdirs()

    val nation = table(s, dir, "nation")
    /** (relative path, row count, bounds for field 1 = n_nationkey). */
    final case class Slice(rel: String, rows: Long, bounds: Map[Int, (Long, Long)])
    def writeSlice(df: DataFrame, name: String): Slice = {
      val stage = new File(root, s"_stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      val rel = s"data/$name.parquet"
      Files.move(part.toPath, new File(root, rel).toPath)
      rm(stage)
      val mm = df.agg(min($"n_nationkey".cast("long")), max($"n_nationkey".cast("long"))).head()
      Slice(rel, df.count(), Map(1 -> (mm.getLong(0), mm.getLong(1))))
    }
    val regions = nation.select($"n_regionkey".cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted
    val originals = regions.map { r =>
      r -> writeSlice(nation.filter($"n_regionkey" === r), s"r$r-full")
    }.toMap
    val rewritten = writeSlice(
      nation.filter($"n_regionkey" === 2 && $"n_nationkey" < 10), "r2-rewrite")

    // snapshot 1: all original files (manifests carry n_nationkey bounds —
    // the reference's column-stats split pruning inputs)
    writeAvro(new File(root, "metadata/manifest-1.avro"), entrySchema,
      regions.toSeq.map(r =>
        entry(1, originals(r).rel, originals(r).rows, bounds = originals(r).bounds)))
    writeAvro(new File(root, "metadata/snap-1.avro"), listSchema,
      Seq(manifestRef("metadata/manifest-1.avro", 1L)))
    // snapshot 2: region 2 rewritten — original carried as a DELETED entry
    writeAvro(new File(root, "metadata/manifest-2.avro"), entrySchema,
      regions.toSeq.filter(_ != 2).map(r =>
        entry(0, originals(r).rel, originals(r).rows, bounds = originals(r).bounds)) ++
        Seq(entry(2, originals(2).rel, originals(2).rows),
          entry(1, rewritten.rel, rewritten.rows, bounds = rewritten.bounds)))
    writeAvro(new File(root, "metadata/snap-2.avro"), listSchema,
      Seq(manifestRef("metadata/manifest-2.avro", 2L)))

    // snapshot 3: v2 POSITION DELETES over snapshot 2's files — a parquet
    // delete file of (file_path, pos) rows targeting n_nationkey 1 and 5,
    // referenced by a content=1 delete manifest. Positions are computed
    // from the same hidden _metadata columns the reader anti-joins on.
    val snap2Files = (regions.toSeq.filter(_ != 2).map(r => originals(r).rel) :+
      rewritten.rel).map(rel => new File(root, rel).getAbsolutePath)
    val delRows = s.read
      .schema(nation.schema).parquet(snap2Files: _*)
      .filter($"n_nationkey".isin(1L, 5L))
      .select($"_metadata.file_path".as("file_path"),
        $"_metadata.row_index".as("pos"))
    val delStage = new File(root, "_stage_del")
    delRows.coalesce(1).write.mode("overwrite").parquet(delStage.getAbsolutePath)
    val delPart = delStage.listFiles().find(_.getName.endsWith(".parquet")).get
    val delRel = "data/pos-deletes.parquet"
    val delCount = delRows.count()
    Files.move(delPart.toPath, new File(root, delRel).toPath)
    rm(delStage)
    writeAvro(new File(root, "metadata/manifest-3-del.avro"), entrySchema,
      Seq(entry(1, delRel, delCount, content = 1)))
    writeAvro(new File(root, "metadata/snap-3.avro"), listSchema,
      Seq(manifestRef("metadata/manifest-2.avro", 2L),
        manifestRef("metadata/manifest-3-del.avro", 3L, content = 1)))

    // snapshot 4: EQUALITY deletes on top of snapshot 3's state — a parquet
    // file of forbidden n_name values with equality_ids = [2]
    val eqStage = new File(root, "_stage_eqdel")
    Seq("CANADA", "KENYA").toDF("n_name")
      .coalesce(1).write.mode("overwrite").parquet(eqStage.getAbsolutePath)
    val eqPart = eqStage.listFiles().find(_.getName.endsWith(".parquet")).get
    val eqRel = "data/eq-deletes.parquet"
    Files.move(eqPart.toPath, new File(root, eqRel).toPath)
    rm(eqStage)
    writeAvro(new File(root, "metadata/manifest-4-eqdel.avro"), entrySchema,
      Seq(entry(1, eqRel, 2, content = 2, equalityIds = Seq(2))))
    writeAvro(new File(root, "metadata/snap-4.avro"), listSchema,
      Seq(manifestRef("metadata/manifest-2.avro", 2L),
        manifestRef("metadata/manifest-3-del.avro", 3L, content = 1),
        manifestRef("metadata/manifest-4-eqdel.avro", 4L, content = 1)))

    // snapshot 5: RE-APPEND a row whose n_name ('CANADA', key 100) the
    // snapshot-4 equality delete forbids — but this file's data sequence
    // number (5) is ABOVE the delete's (4), so per the v2 spec the delete
    // does NOT apply to it. A reader that applies every delete file to
    // every data file wrongly drops this row (the bug this snapshot pins).
    val readded = writeSlice(
      nation.filter($"n_nationkey" === 3L)
        .select(lit(100L).as("n_nationkey"), lit("CANADA").as("n_name"),
          $"n_regionkey".cast("long").as("n_regionkey")),
      "r-readded")
    writeAvro(new File(root, "metadata/manifest-5.avro"), entrySchema,
      Seq(entry(1, readded.rel, readded.rows)))
    writeAvro(new File(root, "metadata/snap-5.avro"), listSchema,
      Seq(manifestRef("metadata/manifest-2.avro", 2L),
        manifestRef("metadata/manifest-5.avro", 5L),
        manifestRef("metadata/manifest-3-del.avro", 3L, content = 1),
        manifestRef("metadata/manifest-4-eqdel.avro", 4L, content = 1)))

    val metadata =
      s"""{"format-version":2,"table-uuid":"graft-nation-iceberg","location":"${root.getAbsolutePath}",
         |"last-sequence-number":5,"last-updated-ms":0,"last-column-id":3,
         |"current-schema-id":0,
         |"schemas":[{"type":"struct","schema-id":0,"fields":[
         |  {"id":1,"name":"n_nationkey","required":false,"type":"long"},
         |  {"id":2,"name":"n_name","required":false,"type":"string"},
         |  {"id":3,"name":"n_regionkey","required":false,"type":"long"}]}],
         |"default-spec-id":0,
         |"partition-specs":[{"spec-id":0,"fields":[
         |  {"name":"n_regionkey","transform":"identity","source-id":3,"field-id":1000}]},
         | {"spec-id":1,"fields":[
         |  {"name":"n_nationkey_bucket","transform":"bucket[4]","source-id":1,"field-id":1001}]}],
         |"current-snapshot-id":3,
         |"snapshots":[
         |  {"snapshot-id":1,"timestamp-ms":0,"manifest-list":"metadata/snap-1.avro","summary":{"operation":"append"}},
         |  {"snapshot-id":2,"timestamp-ms":1,"manifest-list":"metadata/snap-2.avro","summary":{"operation":"overwrite"}},
         |  {"snapshot-id":3,"timestamp-ms":2,"manifest-list":"metadata/snap-3.avro","summary":{"operation":"delete"}},
         |  {"snapshot-id":4,"timestamp-ms":3,"manifest-list":"metadata/snap-4.avro","summary":{"operation":"delete"}},
         |  {"snapshot-id":5,"timestamp-ms":4,"manifest-list":"metadata/snap-5.avro","summary":{"operation":"append"}}]}
         |""".stripMargin
    Files.write(new File(root, "metadata/v1.metadata.json").toPath,
      metadata.getBytes(StandardCharsets.UTF_8))
    Files.write(new File(root, "metadata/.gen-eqseq5").toPath, Array.emptyByteArray)
    root.getAbsolutePath
  }

  /** Current snapshot joined to a fixture dimension, plus a time-travel
    * scalar (snapshot 1's row count) — `FOR VERSION AS OF` semantics. */
  def q_fed_iceberg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildIcebergNation(s, dir)
    // snapshot 2 = the post-rewrite, pre-delete table (current is snapshot
    // 3, exercised with its position deletes by q_fed_iceberg_deletes)
    val cur = graft.catalog.IcebergRead.readTable(s, path, snapshotId = Some(2L))
    val prev = graft.catalog.IcebergRead.readTable(s, path, snapshotId = Some(1L))
      .agg(count(lit(1)).as("prev_n"))
    cur
      .join(broadcast(table(s, dir, "region").select($"r_regionkey", $"r_name")),
        $"n_regionkey" === $"r_regionkey")
      .crossJoin(broadcast(prev))
      .select($"n_nationkey", $"n_name", $"n_regionkey", $"r_name", $"prev_n")
      .orderBy($"n_nationkey")
  }
  val qFedIcebergSql: String =
    """SELECT n_nationkey, n_name, n_regionkey, r_name,
         (SELECT count(*) FROM nation) AS prev_n
       FROM nation JOIN region ON n_regionkey = r_regionkey
       WHERE NOT (n_regionkey = 2 AND n_nationkey >= 10)
       ORDER BY n_nationkey"""

  /** Current snapshot (3) with v2 POSITION DELETES applied: the reader
    * anti-joins the delete file's (file_path, pos) set against the scan's
    * hidden row positions — broadcast, data side unshuffled. Oracle: the
    * deleted keys (1, 5) vanish from the snapshot-2 state. */
  def q_fed_iceberg_deletes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildIcebergNation(s, dir)
    graft.catalog.IcebergRead.readTable(s, path)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"), sum($"n_nationkey").as("key_sum"))
      .orderBy($"n_regionkey")
  }
  val qFedIcebergDeletesSql: String =
    """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
       FROM nation
       WHERE NOT (n_regionkey = 2 AND n_nationkey >= 10)
         AND n_nationkey NOT IN (1, 5)
       GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** Manifest column-stats pruning (the reference's split pruning from
    * per-file lower/upper bounds): a bounded key range plans only the data
    * files whose recorded n_nationkey bounds intersect it — asserted by
    * IcebergReadSpec; correctness shown by the oracle on the surviving
    * rows. The residual filter still applies (bounds are necessary, not
    * sufficient). */
  def q_fed_iceberg_pruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildIcebergNation(s, dir)
    graft.catalog.IcebergRead
      .readTable(s, path, snapshotId = Some(2L),
        prune = Some(graft.catalog.IcebergRead.Prune("n_nationkey", Some(20L), None)))
      .filter($"n_nationkey" >= 20)
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"), sum($"n_nationkey").cast("long").as("key_sum"))
      .orderBy($"n_regionkey")
  }
  val qFedIcebergPrunedSql: String =
    """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
       FROM nation
       WHERE NOT (n_regionkey = 2 AND n_nationkey >= 10)
         AND n_nationkey >= 20
       GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** Snapshot 4 layers EQUALITY deletes (n_name ∈ {CANADA, KENYA},
    * equality_ids = [2]) on top of snapshot 3's position deletes: the
    * reader applies a broadcast null-safe anti-join per equality id set. */
  def q_fed_iceberg_eq_deletes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildIcebergNation(s, dir)
    graft.catalog.IcebergRead.readTable(s, path, snapshotId = Some(4L))
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"), sum($"n_nationkey").cast("long").as("key_sum"))
      .orderBy($"n_regionkey")
  }
  val qFedIcebergEqDeletesSql: String =
    """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
       FROM nation
       WHERE NOT (n_regionkey = 2 AND n_nationkey >= 10)
         AND n_nationkey NOT IN (1, 5)
         AND n_name NOT IN ('CANADA', 'KENYA')
       GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** One loopback Iceberg REST catalog per fixture dir, serving the
    * on-disk nation table under graft.nation. */
  private val restServers =
    scala.collection.mutable.Map[String, graft.catalog.IcebergRestCatalog.Server]()
  private def ensureRest(s: SparkSession, dir: String): Int = synchronized {
    restServers.getOrElseUpdate(dir, {
      val srv = new graft.catalog.IcebergRestCatalog.Server()
      srv.register("graft", "nation", buildIcebergNation(s, dir))
      srv
    }).port
  }

  /** Iceberg REST CATALOG protocol (reference plugin/trino-iceberg with
    * iceberg.catalog.type=rest — TrinoRestCatalog over the public REST
    * spec): the CATALOG, not a directory listing, names the current
    * metadata file (`GET /v1/namespaces/graft/tables/nation` →
    * LoadTableResult.metadata-location); the data path is the ordinary
    * manifest replay with position deletes applied. One bounded metadata
    * GET per query; splits/scans unchanged. */
  def q_fed_iceberg_rest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val port = ensureRest(s, dir)
    graft.catalog.IcebergRestCatalog.read(s, "127.0.0.1", port, "graft", "nation")
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"), sum($"n_nationkey").cast("long").as("key_sum"))
      .orderBy($"n_regionkey")
  }
  val qFedIcebergRestSql: String =
    """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
       FROM nation
       WHERE NOT (n_regionkey = 2 AND n_nationkey >= 10)
         AND n_nationkey NOT IN (1, 5)
       GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** Equality-delete SEQUENCE-NUMBER scoping (v2 spec: an equality delete
    * applies only to data files with a strictly LOWER data sequence
    * number). Snapshot 5 re-appends a 'CANADA' row (key 100) AFTER the
    * snapshot-4 equality delete that forbids 'CANADA': correct scoping
    * keeps the new row while the old CANADA stays deleted — apply-to-all
    * readers get this wrong, which is exactly what the oracle checks. */
  def q_fed_iceberg_eq_seq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = buildIcebergNation(s, dir)
    graft.catalog.IcebergRead.readTable(s, path, snapshotId = Some(5L))
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n"), sum($"n_nationkey").cast("long").as("key_sum"))
      .orderBy($"n_regionkey")
  }
  val qFedIcebergEqSeqSql: String =
    """SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
       FROM (
         SELECT n_nationkey, n_name, n_regionkey FROM nation
         WHERE NOT (n_regionkey = 2 AND n_nationkey >= 10)
           AND n_nationkey NOT IN (1, 5)
           AND n_name NOT IN ('CANADA', 'KENYA')
         UNION ALL
         SELECT 100 AS n_nationkey, 'CANADA' AS n_name, n_regionkey
         FROM nation WHERE n_nationkey = 3
       ) t
       GROUP BY n_regionkey ORDER BY n_regionkey"""

  /** Full write→read roundtrip through graft.catalog.IcebergWrite: two
    * append snapshots of the supplier fixture, replayed by IcebergRead;
    * the oracle replays supplier directly. The time-travel column pins
    * snapshot isolation on the self-written table. */
  def q_fed_iceberg_write(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_write_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new java.io.File(root, "metadata/v2.metadata.json")
    if (!marker.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val sup = table(s, dir, "supplier")
      graft.catalog.IcebergWrite.write(sup.filter($"s_suppkey" % 2 === 0), root.getAbsolutePath)
      graft.catalog.IcebergWrite.write(sup.filter($"s_suppkey" % 2 === 1), root.getAbsolutePath)
    }
    val cur = graft.catalog.IcebergRead.readTable(s, root.getAbsolutePath)
      .groupBy(($"s_suppkey" % 4).as("band"))
      .agg(count(lit(1)).as("n"), asDouble(sum(dec($"s_acctbal"))).as("bal"))
    val snap1 = graft.catalog.IcebergRead
      .readTable(s, root.getAbsolutePath, snapshotId = Some(1L))
      .groupBy(($"s_suppkey" % 4).as("band"))
      .agg(count(lit(1)).as("n_snap1"))
    cur.join(snap1, Seq("band"), "left")
      .select($"band", $"n", $"bal", coalesce($"n_snap1", lit(0L)).as("n_snap1"))
      .orderBy($"band")
  }
  val qFedIcebergWriteSql: String =
    """SELECT s_suppkey % 4 AS band, count(*) AS n,
              CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
              CAST(sum(CASE WHEN s_suppkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_snap1
       FROM supplier GROUP BY 1 ORDER BY band"""

  /** The write-side position-delete path (IcebergWrite.deleteWhere) under
    * the driver gate: a self-written two-snapshot table loses its every-6th
    * row to a distributed position-delete file; the oracle replays the net
    * effect from the fixture. */
  def q_fed_iceberg_posdelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_pd_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new java.io.File(root, "metadata/v3.metadata.json")
    if (!marker.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val sup = table(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      graft.catalog.IcebergWrite.write(sup.filter($"s_suppkey" % 2 === 0), root.getAbsolutePath)
      graft.catalog.IcebergWrite.write(sup.filter($"s_suppkey" % 2 === 1), root.getAbsolutePath)
      graft.catalog.IcebergWrite.deleteWhere(s, root.getAbsolutePath, $"s_suppkey" % 6 === 0)
    }
    graft.catalog.IcebergRead.readTable(s, root.getAbsolutePath)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"), sum($"s_suppkey").cast("long").as("key_sum"))
      .orderBy($"s_nationkey")
  }
  val qFedIcebergPosdeleteSql: String =
    """SELECT s_nationkey, count(*) AS n, CAST(sum(s_suppkey) AS BIGINT) AS key_sum
       FROM supplier WHERE s_suppkey % 6 <> 0
       GROUP BY s_nationkey ORDER BY s_nationkey"""

  /** bucket[8] hidden partitioning (IcebergTransforms: spec murmur3 bucket
    * hash): a point lookup reads ONE bucket's files — manifest partition
    * values prune the other seven (prune counts pinned in IcebergReadSpec;
    * column stats alone cannot, every bucket spans the key range). */
  def q_fed_iceberg_bucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_bucket_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new java.io.File(root, "metadata/v1.metadata.json")
    if (!marker.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val cust = table(s, dir, "customer")
        .select($"c_custkey".cast("long").as("c_custkey"),
          $"c_nationkey".cast("long").as("c_nationkey"))
      graft.catalog.IcebergWrite.write(cust, root.getAbsolutePath,
        partitionBy = Seq("c_custkey"), transform = "bucket[8]")
    }
    graft.catalog.IcebergRead.readTable(s, root.getAbsolutePath,
        prune = Some(graft.catalog.IcebergRead.Prune("c_custkey", Some(42L), Some(42L))))
      .filter($"c_custkey" === 42L)
      .select($"c_custkey", $"c_nationkey")
      .orderBy($"c_custkey")
  }
  val qFedIcebergBucketSql: String =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
              CAST(c_nationkey AS BIGINT) AS c_nationkey
       FROM customer WHERE c_custkey = 42 ORDER BY c_custkey"""

  /** truncate[100] hidden partitioning: a range scan keeps only the
    * overlapping width-100 slabs (truncate pruning is range-aware, unlike
    * bucket). */
  def q_fed_iceberg_truncate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_trunc_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new java.io.File(root, "metadata/v1.metadata.json")
    if (!marker.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val ord = table(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"))
        .filter($"o_orderkey" <= 800)
      graft.catalog.IcebergWrite.write(ord, root.getAbsolutePath,
        partitionBy = Seq("o_orderkey"), transform = "truncate[100]")
    }
    graft.catalog.IcebergRead.readTable(s, root.getAbsolutePath,
        prune = Some(graft.catalog.IcebergRead.Prune("o_orderkey", Some(250L), Some(449L))))
      .filter($"o_orderkey".between(250L, 449L))
      .agg(count(lit(1)).as("n"), sum($"o_orderkey").cast("long").as("key_sum"),
        sum($"o_custkey").cast("long").as("cust_sum"))
  }
  val qFedIcebergTruncateSql: String =
    """SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
              CAST(sum(o_custkey) AS BIGINT) AS cust_sum
       FROM orders WHERE o_orderkey BETWEEN 250 AND 449 AND o_orderkey <= 800"""

  /** month(date) hidden partitioning: a quarter-long date range keeps only
    * its three month partitions (temporal transform pruning over the spec's
    * months-from-1970 partition values). */
  def q_fed_iceberg_month(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_month_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new java.io.File(root, "metadata/v1.metadata.json")
    if (!marker.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val ord = table(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_orderdate".cast("date").as("o_orderdate"))
        .filter($"o_orderdate" >= lit("1995-01-01") && $"o_orderdate" < lit("1996-01-01"))
      graft.catalog.IcebergWrite.write(ord, root.getAbsolutePath,
        partitionBy = Seq("o_orderdate"), transform = "month")
    }
    val lo = java.time.LocalDate.of(1995, 4, 1).toEpochDay
    val hi = java.time.LocalDate.of(1995, 6, 30).toEpochDay
    graft.catalog.IcebergRead.readTable(s, root.getAbsolutePath,
        prune = Some(graft.catalog.IcebergRead.Prune("o_orderdate", Some(lo), Some(hi))))
      .filter($"o_orderdate".between(lit("1995-04-01"), lit("1995-06-30")))
      .agg(count(lit(1)).as("n"), sum($"o_orderkey").cast("long").as("key_sum"))
  }
  val qFedIcebergMonthSql: String =
    """SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
       FROM orders
       WHERE CAST(o_orderdate AS DATE)
             BETWEEN DATE '1995-04-01' AND DATE '1995-06-30'"""

  /** Multi-field partition spec — identity(o_orderstatus) + month
    * (o_orderdate) + bucket[4](o_custkey) on one table (IcebergWrite
    * .writeSpec); the read prunes on the month field while the other two
    * fields ride along in every partition record. */
  def q_fed_iceberg_multipart(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_iceberg_multipart_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
    val marker = new java.io.File(root, "metadata/v1.metadata.json")
    if (!marker.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
      val ord = table(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_orderstatus".cast("string").as("o_orderstatus"),
          $"o_orderdate".cast("date").as("o_orderdate"))
        .filter($"o_orderdate" >= lit("1995-01-01") && $"o_orderdate" < lit("1995-07-01"))
      graft.catalog.IcebergWrite.writeSpec(ord, root.getAbsolutePath,
        Seq("o_orderstatus" -> "identity", "o_orderdate" -> "month",
          "o_custkey" -> "bucket[4]"))
    }
    val lo = java.time.LocalDate.of(1995, 2, 1).toEpochDay
    val hi = java.time.LocalDate.of(1995, 3, 31).toEpochDay
    graft.catalog.IcebergRead.readTable(s, root.getAbsolutePath,
        prune = Some(graft.catalog.IcebergRead.Prune("o_orderdate", Some(lo), Some(hi))))
      .filter($"o_orderdate".between(lit("1995-02-01"), lit("1995-03-31")))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"o_orderkey").cast("long").as("key_sum"))
      .orderBy($"o_orderstatus")
  }
  val qFedIcebergMultipartSql: String =
    """SELECT o_orderstatus, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
       FROM orders
       WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-02-01' AND DATE '1995-03-31'
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val queries: Map[String, Q] = Map(
    "q_fed_iceberg" -> q_fed_iceberg _,
    "q_fed_iceberg_multipart" -> q_fed_iceberg_multipart _,
    "q_fed_iceberg_month" -> q_fed_iceberg_month _,
    "q_fed_iceberg_posdelete" -> q_fed_iceberg_posdelete _,
    "q_fed_iceberg_deletes" -> q_fed_iceberg_deletes _,
    "q_fed_iceberg_pruned" -> q_fed_iceberg_pruned _,
    "q_fed_iceberg_eq_deletes" -> q_fed_iceberg_eq_deletes _,
    "q_fed_iceberg_eq_seq" -> q_fed_iceberg_eq_seq _,
    "q_fed_iceberg_rest" -> q_fed_iceberg_rest _,
    "q_fed_iceberg_write" -> q_fed_iceberg_write _,
    "q_fed_iceberg_bucket" -> q_fed_iceberg_bucket _,
    "q_fed_iceberg_truncate" -> q_fed_iceberg_truncate _)
  val oracles: Map[String, String] = Map(
    "q_fed_iceberg" -> qFedIcebergSql,
    "q_fed_iceberg_multipart" -> qFedIcebergMultipartSql,
    "q_fed_iceberg_month" -> qFedIcebergMonthSql,
    "q_fed_iceberg_posdelete" -> qFedIcebergPosdeleteSql,
    "q_fed_iceberg_deletes" -> qFedIcebergDeletesSql,
    "q_fed_iceberg_pruned" -> qFedIcebergPrunedSql,
    "q_fed_iceberg_eq_deletes" -> qFedIcebergEqDeletesSql,
    "q_fed_iceberg_eq_seq" -> qFedIcebergEqSeqSql,
    "q_fed_iceberg_rest" -> qFedIcebergRestSql,
    "q_fed_iceberg_write" -> qFedIcebergWriteSql,
    "q_fed_iceberg_bucket" -> qFedIcebergBucketSql,
    "q_fed_iceberg_truncate" -> qFedIcebergTruncateSql)
}
