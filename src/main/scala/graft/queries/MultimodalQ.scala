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

  /** Q43 — frame sampling (every 3rd frame) through the decoder boundary.
    * The sampled byte positions are expressible in SQL (frame index
    * (i-1)//64 ≡ 0 mod 3), so the sampling path gets a full oracle like
    * q32. Frame 0 is always sampled, so the checksum list is non-empty for
    * non-empty docs.
    */
  private val q43 = Q(
    fn = (s, d) => {
      import s.implicits._
      Multimodal.sampledFrameFeatures(
          Multimodal.asMedia(Tables.documents(s, d)), everyNth = 3)
        .toDF()
        .orderBy($"doc_id")
    },
    oracle = Some("""
      SELECT doc_id,
             CAST(CEIL(CEIL(strlen(text) / 64.0) / 3.0) AS INT) AS n_frames,
             CAST(LEAST(64, strlen(text)) AS INT) AS frame_bytes,
             CAST(list_reduce(list_transform(
                 list_filter(generate_series(1, strlen(text)),
                   i -> ((i - 1) // 64) % 3 = 0),
                 i -> ascii(text[i:i])),
               (acc, c) -> (CAST(acc AS BIGINT) * 31 + c) % 1000000007) AS BIGINT) AS feature_checksum
      FROM documents
      ORDER BY doc_id"""))

  /** Q44 — per-frame resize (truncate-or-zero-pad to 32 bytes) between
    * decode and feature extraction. Truncation keeps frame-local byte
    * offsets 0..31; the final short frame zero-pads, and pad bytes fold
    * into the checksum as 0 (acc*31 steps) — all reproducible in SQL.
    */
  private val q44 = Q(
    fn = (s, d) => {
      import s.implicits._
      Multimodal.resizedFrameFeatures(Multimodal.asMedia(Tables.documents(s, d)))
        .toDF()
        .orderBy($"doc_id")
    },
    oracle = Some("""
      SELECT doc_id,
             CAST(CEIL(strlen(text) / 64.0) AS INT) AS n_frames,
             CAST(32 AS INT) AS frame_bytes,
             CAST(list_reduce(list_transform(
                 generate_series(0, CAST(CEIL(strlen(text) / 64.0) AS INT) * 32 - 1),
                 g -> CASE WHEN (g // 32) * 64 + (g % 32) + 1 <= strlen(text)
                           THEN ascii(text[((g // 32) * 64 + (g % 32) + 1):((g // 32) * 64 + (g % 32) + 1)])
                           ELSE 0 END),
               (acc, c) -> (CAST(acc AS BIGINT) * 31 + c) % 1000000007) AS BIGINT) AS feature_checksum
      FROM documents
      ORDER BY doc_id"""))

  /** Q73 — cross-media frame-level dedup: hash every fixed-64-byte frame
    * of every payload and report, per medium, how many of its frames also
    * occur in at least one OTHER medium (q65's duplicate-span signal at
    * the binary-frame granularity — repeated intros/watermarks/silence in
    * media corpora). Pure metadata-path: frames are cut with `substring`
    * on the binary column and keyed by md5 — no decoder, codegen
    * throughout, and the q65 collapse shape (per-(doc, frame-hash) counts
    * die in the scan task; df is a count over distinct doc-frame rows;
    * both consumers share one exchange via AQE stage reuse).
    *
    * Oracle parity note: the oracle cuts frames with character `substr`
    * while the engine cuts bytes — equal because this corpus is ASCII
    * (the standing convention of the q31/q32 oracles, which md5 the text
    * directly). Real multi-byte media payloads have no text twin at all;
    * the engine's byte-frame semantics are the defined behavior.
    */
  private val q73 = Q(
    fn = (s, d) => {
      import s.implicits._
      val media = Multimodal.asMedia(Tables.documents(s, d))
      TextOps.dupFraction(
          media
            .select($"doc_id", $"content",
              explode(sequence(lit(1), greatest(length($"content"), lit(1)), lit(64)))
                .as("start"))
            .select($"doc_id",
              unhex(md5(expr("substring(content, start, 64)"))).as("key")))
        .withColumnRenamed("n_spans", "n_frames")
        .withColumnRenamed("n_dup_spans", "n_dup_frames")
    },
    oracle = Some("""
      WITH f AS (
        SELECT doc_id,
               md5(substr(text, start, 64)) AS fk
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(strlen(text), 1), 64)) AS start
              FROM documents)),
      g AS (
        SELECT doc_id, fk, CAST(COUNT(*) AS BIGINT) AS c
        FROM f GROUP BY doc_id, fk),
      df AS (
        SELECT fk, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY fk)
      SELECT g.doc_id,
             CAST(SUM(g.c) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN df.df >= 2 THEN g.c ELSE 0 END) AS BIGINT) AS n_dup_frames,
             CAST(SUM(CASE WHEN df.df >= 2 THEN g.c ELSE 0 END) AS DOUBLE)
               / CAST(SUM(g.c) AS DOUBLE) AS dup_frac
      FROM g JOIN df USING (fk)
      GROUP BY g.doc_id
      ORDER BY g.doc_id"""))

  val all: Map[String, Q] = Map(
    "q31_media_metadata" -> q31,
    "q32_media_frame_features" -> q32,
    "q43_media_frame_sample" -> q43,
    "q44_media_frame_resize" -> q44,
    "q73_frame_dedup" -> q73,
  )
}
