package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val media = Multimodal.asMedia(tables.documents)

  test("media table carries binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val row = media.select(col("meta.format"), col("meta.content_length")).first()
    assert(row.getString(0) === "text/plain")
  }

  test("feature extraction is deterministic and checksums match payload bytes") {
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === tables.documents.count())
    // recompute one checksum on the driver for a sampled doc
    val doc = tables.documents.select("doc_id", "text").first()
    val bytes = doc.getString(1).getBytes("UTF-8")
    var sum = 0L; bytes.foreach(b => sum = sum * 31 + (b & 0xff))
    val f = feats.find(_.doc_id == doc.getLong(0)).get
    assert(f.checksum === sum)
    assert(f.n_bytes === bytes.length)
  }

  test("resize bounds every thumbnail to width*height bytes") {
    val out = Multimodal.resize(spark, media, width = 4, height = 4).collect()
    assert(out.length === tables.documents.count())
    assert(out.forall(_.thumb.length <= 16))
    assert(out.forall(r => r.width == 4 && r.height == 4))
  }

  test("frame sampling keeps every Nth frame with correct sizes") {
    val out = Multimodal.frameSample(spark, media, frameBytes = 100, everyN = 3)
    val byDoc = out.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { frames =>
      assert(frames.map(_.frame_idx).forall(_ % 3 == 0))
      assert(frames.forall(_.frame.length <= 100))
    }
    // a doc with n bytes yields ceil((n/100)/3)-ish frames: spot-check one
    val doc = tables.documents.select("doc_id", "text").first()
    val n = doc.getString(1).getBytes("UTF-8").length
    val expected = (0 until math.max(1, n / 100) by 3).size
    assert(byDoc(doc.getLong(0)).length === expected)
  }
}
