package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column queries: binary payload metadata (declarative, no
  * decode) and the decoder-boundary frame-feature path. See
  * [[graft.multimodal.Multimodal]].
  */
object MultimodalQ {

  /** Q31 — media catalog scan: byte length, content hash, header bytes,
    * frame count from binary metadata only. Never touches a decoder —
    * the 100 TB dedup-by-checksum / catalog path.
    */
  private val q31 = Q(
    fn = (s, d) => {
      import s.implicits._
      Multimodal.mediaMetadata(Multimodal.asMedia(Tables.documents(s, d)))
        .orderBy($"doc_id")
    },
    oracle = Some("""
      SELECT doc_id,
             CASE WHEN n_chars < 150 THEN 'image'
                  WHEN n_chars < 350 THEN 'audio'
                  ELSE 'video' END AS kind,
             CAST(strlen(text) AS BIGINT) AS byte_len,
             md5(text) AS content_md5,
             lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS header_hex,
             CAST(CEIL(strlen(text) / 64.0) AS BIGINT) AS n_frames
      FROM documents
      ORDER BY doc_id"""))

  /** Q32 — frame decode + feature extraction through the
    * [[Multimodal.FrameDecoder]] mapPartitions boundary. The stub
    * decoder's rolling checksum is byte-exact reproducible in SQL, so
    * even the imperative path gets a full oracle (ascii corpus: byte ==
    * ascii code).
    */
  private val q32 = Q(
    fn = (s, d) => {
      import s.implicits._
      Multimodal.frameFeatures(Multimodal.asMedia(Tables.documents(s, d)))
        .toDF()
        .orderBy($"doc_id")
    },
    oracle = Some("""
      SELECT doc_id,
             CAST(CEIL(strlen(text) / 64.0) AS INT) AS n_frames,
             CAST(LEAST(64, strlen(text)) AS INT) AS frame_bytes,
             CAST(list_reduce(list_transform(generate_series(1, strlen(text)),
                 i -> ascii(text[i:i])),
               (acc, c) -> (CAST(acc AS BIGINT) * 31 + c) % 1000000007) AS BIGINT) AS feature_checksum
      FROM documents
      ORDER BY doc_id"""))

  val all: Map[String, Q] = Map(
    "q31_media_metadata" -> q31,
    "q32_media_frame_features" -> q32,
  )
}
