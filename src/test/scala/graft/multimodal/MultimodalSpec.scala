package graft.multimodal

import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("decoder boundary: swapping frame width changes batch shape, not plumbing") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001)).limit(20)
    val f64 = Multimodal.frameFeatures(media, new Multimodal.FixedWidthFakeDecoder(64)).collect()
    val f16 = Multimodal.frameFeatures(media, new Multimodal.FixedWidthFakeDecoder(16)).collect()
    assert(f64.length == 20 && f16.length == 20)
    val by64 = f64.map(f => f.doc_id -> f).toMap
    f16.foreach { f =>
      assert(f.n_frames >= by64(f.doc_id).n_frames, "narrower frames -> more of them")
      // rolling checksum over concatenated frames is frame-width invariant
      assert(f.feature_checksum == by64(f.doc_id).feature_checksum)
    }
    assert(f16.forall(_.frame_bytes == 16))
  }

  test("metadata projection stays binary-only (no decode) and is stable") {
    val meta = Multimodal.mediaMetadata(Multimodal.asMedia(Tables.documents(spark, sf0001)))
    val rows = meta.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getString(3).length == 32), "md5 hex")
    assert(rows.forall(r => Set("image", "audio", "video")(r.getString(1))))
    val again = meta.collect()
    assert(rows.map(_.getString(3)).toSeq == again.map(_.getString(3)).toSeq)
  }
}
