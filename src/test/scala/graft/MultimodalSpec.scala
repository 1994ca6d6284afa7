package graft

/** Multimodal plumbing spec: binary payload column survives the round trip,
  * the partition-wise decode emits the contracted schema, and features are
  * deterministic. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payloads with typed metadata") {
    val m = operators.Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.orderBy("media_id").first()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("kind")))
  }

  test("resize stub shrinks payload and keeps metadata consistent") {
    val media = operators.Multimodal.mediaTable(spark, sfDir)
      .as[operators.Multimodal.MediaRow]
    val before = media.orderBy("media_id").limit(10).collect()
    val after = operators.Multimodal.resizeStub(media)
      .orderBy("media_id").limit(10).collect()
    before.zip(after).foreach { case (b, a) =>
      assert(a.media_id == b.media_id)
      assert(a.payload.length <= b.payload.length / 4 + 1)
      assert(a.width == math.max(b.width / 2, 1) && a.height == math.max(b.height / 2, 1))
    }
  }

  test("frame sampling partitions each video payload completely and in order") {
    val media = operators.Multimodal.mediaTable(spark, sfDir)
      .as[operators.Multimodal.MediaRow]
    val videos = media.filter(_.kind == "video")
      .collect().map(r => r.media_id -> r.payload.length).toMap
    val frames = operators.Multimodal.frameSampleStub(media, 4).collect()
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
      assert(fs.map(_.frame_bytes.length).sum == videos(id), s"frames must tile payload $id")
    }
  }

  test("decode stub emits fixed-width features deterministically") {
    val feats = operators.Multimodal.decodeStub(
      operators.Multimodal.mediaTable(spark, sfDir).as[operators.Multimodal.MediaRow])
    val rows1 = feats.orderBy("media_id").limit(5).collect()
    val rows2 = feats.orderBy("media_id").limit(5).collect()
    assert(rows1.map(_.feature.toSeq).toSeq == rows2.map(_.feature.toSeq).toSeq)
    assert(rows1.forall(_.feature.length == 8))
    // features are distributions: each in [0,1], summing to ~1
    rows1.foreach { r =>
      assert(r.feature.forall(f => f >= 0.0f && f <= 1.0f))
      assert(math.abs(r.feature.map(_.toDouble).sum - 1.0) < 1e-6)
    }
  }

  test("checksum equals the text fingerprint (shared arithmetic)") {
    val viaMedia = operators.Multimodal.decodeStub(
        operators.Multimodal.mediaTable(spark, sfDir).as[operators.Multimodal.MediaRow])
      .select($"media_id", $"checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaText = operators.table(spark, sfDir, "documents")
      .select($"doc_id", graft.functions.TextFunctions.polyFingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMedia == viaText)
  }
}
