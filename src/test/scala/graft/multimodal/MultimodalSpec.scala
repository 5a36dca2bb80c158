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

  test("q134 perceptual frame dedup: planted near-copies are caught, unrelated frames are not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val f0 = "abcdefgh" * 8                       // 64 chars, rising runs
    // NOT another rising-run pattern: dHash of periodic ascending text is
    // degenerate (any same-period rising pattern hashes identically), so
    // the unique frame alternates instead
    val f1 = "ab" * 32
    val shifted = f0.map(c => (c + 1).toChar)     // order-preserving "+brightness"
    val noisy = f0.updated(10, 'a')               // disturbs <= 2 dHash bits
    val unrelated = "zyxwvuts" * 8                // descending runs, far hash
    val rows = Seq(
      (0L, f0 + " " + f1.drop(1)),               // frames: [f0, ' '+f1.drop(1)]
      (1L, shifted),
      (2L, noisy),
      (3L, unrelated))
    val dir = tmpDir("q134corpus")
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("q134_frame_phash_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recall: both planted near-copies (shifted AND noisy) match doc 0's
    // first frame; precision: doc 0's second frame and the unrelated doc
    // stay clean
    assert(out(0L) == (2L, 1L), s"doc0: ${out(0L)}")
    assert(out(1L) == (1L, 1L), "brightness shift cannot escape dHash")
    assert(out(2L) == (1L, 1L), "small noise stays within hamming 7")
    assert(out(3L) == (1L, 0L), "unrelated frame stays clean")
  }

  test("q134 frame cut == FixedWidthFakeDecoder boundary on full frames") {
    import spark.implicits._
    val media = Multimodal.asMedia(Tables.documents(spark, sf0001)).limit(30)
    val dec = new Multimodal.FixedWidthFakeDecoder(64)
    media.select($"doc_id", $"content").collect().foreach { r =>
      val payload = r.getAs[Array[Byte]]("content")
      val viaDecoder = dec.decode(payload).filter(_.length == 64).map(_.toSeq)
      val viaSubstring = payload.grouped(64).filter(_.length == 64).map(_.toSeq).toSeq
      assert(viaDecoder == viaSubstring,
        s"doc ${r.getLong(0)}: declarative 64-byte cut must equal the decoder contract")
    }
  }
}
