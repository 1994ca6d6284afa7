package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.catalog.{HudiRead, HudiWrite}

/** MOR write → snapshot-read roundtrips: createMor (base deltacommit),
  * upsertMor (updates as log appends + inserts as new base groups),
  * deleteMor (DELETE log blocks), repeated upserts of the same key, and
  * the read-optimized view staying stale by design. */
class HudiMorWriteSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val d = new File(s"/tmp/graft_mor_$name")
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(d)
    d.getAbsolutePath
  }

  private def nationBase = {
    import spark.implicits._
    graft.sources.Tables.load(spark, sfDir, "nation")
      .select($"n_nationkey".cast("long").as("k"), $"n_name".as("nm"),
        $"n_regionkey".cast("long").as("r"))
  }

  test("createMor then snapshot read returns the table") {
    val path = freshDir("create")
    HudiWrite.createMor(nationBase, path, "k")
    val got = HudiRead.readTableSnapshot(spark, path)
    assert(got.count() == 25)
    assert(got.columns.contains("_hoodie_record_key"))
    assert(got.filter(col("_hoodie_record_key") === "7").count() == 1)
    // deltacommit timeline, not commit
    val names = new File(path, ".hoodie").list().toSeq
    assert(names.exists(n => n.endsWith(".deltacommit") && !n.contains(".deltacommit.")))
    assert(!names.exists(n => n.endsWith(".commit") && !n.contains(".commit.")))
  }

  test("upsertMor appends logs for updates and new base groups for inserts") {
    import spark.implicits._
    val path = freshDir("upsert")
    HudiWrite.createMor(nationBase, path, "k")
    val baseFilesBefore = countBaseFiles(path)
    val batch = Seq((3L, "UPDATED-3", 1L), (7L, "UPDATED-7", 2L),
      (900L, "INSERTED", 4L)).toDF("k", "nm", "r")
    HudiWrite.upsertMor(spark, batch, path)
    val snapMap = HudiRead.readTableSnapshot(spark, path)
      .select($"k", $"nm").as[(Long, String)].collect().toMap
    assert(snapMap.size == 26) // 25 + 1 insert
    assert(snapMap(3L) == "UPDATED-3")
    assert(snapMap(7L) == "UPDATED-7")
    assert(snapMap(900L) == "INSERTED")
    assert(snapMap(5L).nonEmpty && snapMap(5L) != "UPDATED-5") // untouched rows intact
    // updates appended logs (no base rewrite); the insert added base files
    val logs = countLogFiles(path)
    assert(logs >= 1, "updates must land as log files")
    assert(countBaseFiles(path) > baseFilesBefore, "insert must add a base group")
    // read-optimized view is stale for updates but sees inserted base files
    val ro = HudiRead.readTable(spark, path)
      .select($"k", $"nm").as[(Long, String)].collect().toMap
    assert(ro(3L) != "UPDATED-3", "read-optimized must not see log updates")
    assert(ro.contains(900L), "read-optimized must see inserted base files")
  }

  test("re-upserting a key already introduced by a log routes to its group") {
    import spark.implicits._
    val path = freshDir("reupsert")
    HudiWrite.createMor(nationBase, path, "k")
    HudiWrite.upsertMor(spark, Seq((900L, "v1", 4L)).toDF("k", "nm", "r"), path)
    val basesAfterInsert = countBaseFiles(path)
    // 900 now lives in a base group created by the previous deltacommit;
    // updating it again must append a log, not a second base group
    HudiWrite.upsertMor(spark, Seq((900L, "v2", 4L)).toDF("k", "nm", "r"), path)
    assert(countBaseFiles(path) == basesAfterInsert)
    val snapMap = HudiRead.readTableSnapshot(spark, path)
      .select($"k", $"nm").as[(Long, String)].collect().toMap
    assert(snapMap(900L) == "v2")
    assert(snapMap.size == 26)
    // and a THIRD update of a key whose latest state is log-only
    HudiWrite.upsertMor(spark, Seq((3L, "u1", 1L)).toDF("k", "nm", "r"), path)
    HudiWrite.upsertMor(spark, Seq((3L, "u2", 1L)).toDF("k", "nm", "r"), path)
    val m2 = HudiRead.readTableSnapshot(spark, path)
      .select($"k", $"nm").as[(Long, String)].collect().toMap
    assert(m2(3L) == "u2")
    assert(m2.size == 26)
  }

  test("deleteMor tombstones via DELETE log blocks; re-upsert re-inserts") {
    import spark.implicits._
    val path = freshDir("delete")
    HudiWrite.createMor(nationBase, path, "k")
    val basesBefore = countBaseFiles(path)
    HudiWrite.deleteMor(spark, path, col("k") % 5 === 0)
    assert(countBaseFiles(path) == basesBefore, "delete must not rewrite bases")
    val snap = HudiRead.readTableSnapshot(spark, path)
      .select($"k").as[Long].collect().toSet
    assert(snap.size == 20)
    assert(!snap.exists(_ % 5 == 0))
    // a deleted key re-upserted is an INSERT (its latest action was delete)
    HudiWrite.upsertMor(spark, Seq((5L, "BACK", 0L)).toDF("k", "nm", "r"), path)
    val after = HudiRead.readTableSnapshot(spark, path)
      .select($"k", $"nm").as[(Long, String)].collect().toMap
    assert(after(5L) == "BACK")
    assert(after.size == 21)
  }

  test("partitioned MOR roundtrip routes per partition path") {
    import spark.implicits._
    val path = freshDir("part")
    HudiWrite.createMor(nationBase, path, "k", partitionBy = Some("r"))
    // hive-style partition dirs exist
    val dirs = new File(path).list().toSeq.filter(_.startsWith("r="))
    assert(dirs.sorted == Seq("r=0", "r=1", "r=2", "r=3", "r=4"))
    // key 3 lives in r=3 (synthetic nation: regionkey = key % 5); the
    // update must carry ITS partition — the partition path is part of the
    // Hudi key, so a different r would correctly be an insert
    HudiWrite.upsertMor(spark,
      Seq((3L, "UPD", 3L), (950L, "NEW", 3L)).toDF("k", "nm", "r"), path)
    val snap = HudiRead.readTableSnapshot(spark, path)
    assert(snap.count() == 26)
    val m = snap.select($"k", $"nm").as[(Long, String)].collect().toMap
    assert(m(3L) == "UPD" && m(950L) == "NEW")
    // the update's log file lives under the partition directory
    assert(countLogFiles(path) >= 1)
    val partLogs = Option(new File(path, "r=3").listFiles()).getOrElse(Array.empty)
      .count(f => f.getName.startsWith(".") && f.getName.contains(".log."))
    assert(partLogs >= 1, "log file must sit in its partition dir")
    // an upsert to the SAME key in a DIFFERENT partition is an insert
    // (Hudi key = record key + partition path)
    HudiWrite.upsertMor(spark,
      Seq((3L, "OTHER-PART", 1L)).toDF("k", "nm", "r"), path)
    val dup = HudiRead.readTableSnapshot(spark, path)
      .filter($"k" === 3L).count()
    assert(dup == 2)
  }

  private def countBaseFiles(path: String): Int = walk(new File(path))
    .count(f => f.getName.endsWith(".parquet"))
  private def countLogFiles(path: String): Int = walk(new File(path))
    .count(f => f.getName.startsWith(".") && f.getName.contains(".log."))
  private def walk(dir: File): Seq[File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      if (f.isDirectory) { if (f.getName == ".hoodie") Seq.empty else walk(f) }
      else Seq(f)
    }
}
