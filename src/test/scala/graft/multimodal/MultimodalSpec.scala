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

  test("frame sampling: everyNth=1 == full decode; sample is a prefix-closed subset") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001)).limit(20)
    val full = Multimodal.frameFeatures(media).collect().map(f => f.doc_id -> f).toMap
    val all1 = Multimodal.sampledFrameFeatures(media, everyNth = 1).collect()
    all1.foreach(f => assert(f == full(f.doc_id)))
    val every3 = Multimodal.sampledFrameFeatures(media, everyNth = 3).collect()
    every3.foreach { f =>
      val n = full(f.doc_id).n_frames
      assert(f.n_frames == (n + 2) / 3, "ceil(n/3) frames survive")
      assert(f.frame_bytes == full(f.doc_id).frame_bytes, "frame 0 always sampled")
    }
  }

  test("frame resize: truncate-or-pad to target, checksum reflects resized bytes") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001)).limit(20)
    val r = Multimodal.resizedFrameFeatures(media,
      resizer = new Multimodal.TruncatePadFakeResizer(32)).collect()
    val full = Multimodal.frameFeatures(media).collect().map(f => f.doc_id -> f).toMap
    r.foreach { f =>
      assert(f.frame_bytes == 32)
      assert(f.n_frames == full(f.doc_id).n_frames, "resize preserves frame count")
    }
    // pad path: a payload shorter than the target becomes one zero-padded frame
    val tiny = Multimodal.asMedia(
      Tables.documents(spark, sf0001).limit(1)
        .withColumn("text", org.apache.spark.sql.functions.lit("ab")))
    val t = Multimodal.resizedFrameFeatures(tiny,
      resizer = new Multimodal.TruncatePadFakeResizer(4)).head()
    assert(t.n_frames == 1 && t.frame_bytes == 4)
    // checksum of 'a','b',0,0 = ((97*31+98)*31+0)*31+0
    assert(t.feature_checksum == ((97L * 31 + 98) * 31 % 1000000007L) * 31 % 1000000007L)
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
