package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: the lexical (BM25, q84) and dense (cosine ANN
  * family, q25/q78) serving legs fused by Reciprocal Rank Fusion
  * (Cormack, Clarke & Buettcher, SIGIR 2009) — the standard
  * lexical + semantic composition a RAG/training-data retrieval stack
  * serves in production. Each leg runs its own scan-shaped kernel; the
  * fusion only ever touches the two nq·depth rank lists.
  */
object Retrieval {

  /** RRF smoothing constant (the paper's k = 60). */
  private val RrfK = 60
  /** Per-leg candidate depth fed into the fusion. */
  private val Depth = 20

  /** Fuse two rank lists by RRF. `lex` carries (query_id, doc_id, rank),
    * `dense` (query_id, neighbor_id, rank); a document missing from one
    * leg's top-`Depth` contributes 0 from that leg (rank sentinel 0 in
    * the output). The score `1/(RrfK+r_lex) + 1/(RrfK+r_dense)` is a
    * fixed-shape IEEE expression over small exact integers — two
    * divisions and one addition on identical operands — so it is
    * bit-identical across engines and the full row hash-checks.
    *
    * Scale shape: both inputs are nq·Depth rows (the legs already did
    * the corpus-sized work map-side), so the full-outer join, window
    * rank and sort here cost O(nq·Depth) — negligible at any corpus
    * size; the 100 TB story lives in the legs (Bm25ScanTopK's bounded
    * scan aggregate; the dense leg swaps to q79's IVF-PQ scan when the
    * corpus outgrows brute force — fusion is agnostic to which dense
    * kernel produced the ranks).
    */
  private[graft] def rrfFuse(lex: DataFrame, dense: DataFrame,
      topN: Int): DataFrame = {
    val s = lex.sparkSession
    import s.implicits._
    val l = lex.select($"query_id", $"doc_id", $"rank".cast("long").as("lex_rank"))
    val dn = dense.select($"query_id", $"neighbor_id".as("doc_id"),
      $"rank".cast("long").as("dense_rank"))
    l.join(dn, Seq("query_id", "doc_id"), "full_outer")
      .na.fill(0L, Seq("lex_rank", "dense_rank"))
      .withColumn("rrf_score",
        when($"lex_rank" > 0, lit(1.0) / ($"lex_rank" + RrfK)).otherwise(lit(0.0)) +
          when($"dense_rank" > 0, lit(1.0) / ($"dense_rank" + RrfK)).otherwise(lit(0.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"rrf_score".desc, $"doc_id"))
        .cast("long"))
      .filter($"rank" <= topN)
      .select($"query_id", $"doc_id", $"lex_rank", $"dense_rank",
        $"rrf_score", $"rank")
      .orderBy($"query_id", $"rank")
  }

  /** Q88 — hybrid top-10: BM25 top-20 (q84's artifact + scan kernel)
    * and exact-cosine top-20 (q25's quantized kernel) over the SAME
    * request set (every 37th document under [[TextOps.QuerySetCap]] —
    * absolutely bounded, ≤100 queries at any corpus size — which is
    * also vec_id in the aligned embeddings table), fused by RRF. Both
    * legs exclude the query document itself. */
  private val q88 = Q(
    fn = (s, d) => {
      val lex = TextOps.bm25TopK(
        TextOps.bm25StoreCached(s, d), TextOps.bm25QueryRows(s, d), Depth)
      val dense = VectorOps.cosineTopK(s, d,
        c => c % 37 === 0 && c < TextOps.QuerySetCap, Depth)
      rrfFuse(lex, dense, 10)
    },
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term
      ), dlen AS (
        SELECT doc_id, COUNT(*) AS len FROM t GROUP BY doc_id
      ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      ), stats AS (
        SELECT COUNT(*) AS n, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dlen
      ), idf AS (
        SELECT term,
               CAST(FLOOR(LN((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6) AS BIGINT) AS idf_fp,
               avgdl
        FROM df CROSS JOIN stats
      ), w AS (
        SELECT tf.doc_id, tf.term,
               idf_fp * CAST(FLOOR((tf * 2.2) /
                 (tf + 1.2 * (0.25 + 0.75 * len / avgdl)) * 1e6) AS BIGINT) AS w_fp
        FROM tf JOIN dlen USING (doc_id) JOIN idf USING (term)
      ), qterms AS (
        SELECT doc_id AS query_id, term FROM tf
        WHERE doc_id % 37 = 0 AND doc_id < 3700
      ), scored_l AS (
        SELECT qterms.query_id, w.doc_id, CAST(SUM(w_fp) AS BIGINT) AS score_fp
        FROM qterms JOIN w USING (term)
        WHERE w.doc_id <> qterms.query_id
        GROUP BY qterms.query_id, w.doc_id
      ), lex AS (
        SELECT query_id, doc_id, lex_rank FROM (
          SELECT query_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score_fp DESC, doc_id) AS lex_rank
          FROM scored_l)
        WHERE lex_rank <= 20
      ), qv AS (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qvv
        FROM embeddings
      ), withn AS (
        SELECT vec_id, qvv,
               list_sum(list_transform(generate_series(1, len(qvv)), i -> qvv[i] * qvv[i])) AS qq
        FROM qv
      ), scored_d AS (
        SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
               CAST(list_sum(list_transform(generate_series(1, len(a.qvv)),
                    i -> a.qvv[i] * b.qvv[i])) AS DOUBLE)
                 / (SQRT(CAST(a.qq AS DOUBLE)) * SQRT(CAST(b.qq AS DOUBLE))) AS score
        FROM withn a JOIN withn b ON a.vec_id % 37 = 0 AND a.vec_id < 3700
          AND a.vec_id <> b.vec_id
      ), dense AS (
        SELECT query_id, doc_id, dense_rank FROM (
          SELECT query_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS dense_rank
          FROM scored_d)
        WHERE dense_rank <= 20
      ), fused AS (
        SELECT COALESCE(l.query_id, dn.query_id) AS query_id,
               COALESCE(l.doc_id, dn.doc_id) AS doc_id,
               CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
               CAST(COALESCE(dn.dense_rank, 0) AS BIGINT) AS dense_rank
        FROM lex l FULL OUTER JOIN dense dn
          ON l.query_id = dn.query_id AND l.doc_id = dn.doc_id
      ), rrf AS (
        SELECT query_id, doc_id, lex_rank, dense_rank,
               (CASE WHEN lex_rank > 0
                     THEN CAST(1 AS DOUBLE) / (lex_rank + 60)
                     ELSE CAST(0 AS DOUBLE) END)
             + (CASE WHEN dense_rank > 0
                     THEN CAST(1 AS DOUBLE) / (dense_rank + 60)
                     ELSE CAST(0 AS DOUBLE) END) AS rrf_score
        FROM fused
      ), out AS (
        SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY rrf_score DESC, doc_id) AS rank
        FROM rrf)
      SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
             CAST(rank AS BIGINT) AS rank
      FROM out WHERE rank <= 10
      ORDER BY query_id, rank"""))

  /** Q168 — PASSAGE-LEVEL hybrid retrieval: q88's RRF fusion with the
    * lexical leg at chunk granularity — the production RAG serving
    * composition for long documents (dense encoders embed whole docs or
    * leading windows; lexical evidence lives in the best PASSAGE; fusing
    * doc-level dense ranks with max-passage lexical ranks gets both).
    * Lexical leg: q163's chunk store (shared cache), top-40 chunks per
    * % 37 request, pooled to top-20 documents by best passage
    * ([[TextOps.maxPassagePool]], shared). Dense leg: q25's exact
    * quantized cosine, same request set, depth 20 (q88's leg verbatim —
    * swap in q79's IVF-PQ scan past brute-force scale, fusion is
    * agnostic). Fused by [[rrfFuse]], top-10. The oracle replays the
    * whole composition — chunking, chunk BM25, pooling, dense scoring,
    * RRF — from scratch.
    */
  private val q168 = Q(
    fn = (s, d) => {
      val lexDocs = TextOps.maxPassagePool(
        TextOps.bm25TopK(TextOps.bm25ChunkStoreCached(s, d),
          TextOps.bm25QueryRows(s, d), 2 * Depth), Depth)
      val dense = VectorOps.cosineTopK(s, d,
        c => c % 37 === 0 && c < TextOps.QuerySetCap, Depth)
      rrfFuse(lexDocs, dense, 10)
    },
    oracle = Some("""
      WITH w0 AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), ch AS (
        SELECT doc_id * 100000 + (start - 1) // 24 + 1 AS cid,
               array_to_string(w[start:start+31], ' ') AS ctext
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w), 24)) AS start
              FROM w0)
      ), t AS (
        SELECT cid, unnest(string_split(ctext, ' ')) AS term FROM ch
      ), tf AS (
        SELECT cid, term, COUNT(*) AS tf FROM t GROUP BY cid, term
      ), dlen AS (
        SELECT cid, COUNT(*) AS len FROM t GROUP BY cid
      ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      ), stats AS (
        SELECT COUNT(*) AS n, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dlen
      ), idf AS (
        SELECT term,
               CAST(FLOOR(LN((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6) AS BIGINT) AS idf_fp,
               avgdl
        FROM df CROSS JOIN stats
      ), wt AS (
        SELECT tf.cid, tf.term,
               idf_fp * CAST(FLOOR((tf * 2.2) /
                 (tf + 1.2 * (0.25 + 0.75 * len / avgdl)) * 1e6) AS BIGINT) AS w_fp
        FROM tf JOIN dlen USING (cid) JOIN idf USING (term)
      ), qterms AS (
        SELECT DISTINCT doc_id AS query_id, term FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents WHERE doc_id % 37 = 0 AND doc_id < 3700)
      ), scored_c AS (
        SELECT qterms.query_id, wt.cid, CAST(SUM(w_fp) AS BIGINT) AS score_fp
        FROM qterms JOIN wt USING (term)
        GROUP BY qterms.query_id, wt.cid
      ), topch AS (
        SELECT query_id, cid, score_fp FROM (
          SELECT query_id, cid, score_fp,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score_fp DESC, cid) AS rk
          FROM scored_c)
        WHERE rk <= 40
      ), pooled AS (
        SELECT query_id, doc_id, score_fp FROM (
          SELECT query_id, (cid - 1) // 100000 AS doc_id, score_fp,
                 ROW_NUMBER() OVER (PARTITION BY query_id, (cid - 1) // 100000
                   ORDER BY score_fp DESC, cid) AS rn
          FROM topch WHERE (cid - 1) // 100000 <> query_id)
        WHERE rn = 1
      ), lex AS (
        SELECT query_id, doc_id, lex_rank FROM (
          SELECT query_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score_fp DESC, doc_id) AS lex_rank
          FROM pooled)
        WHERE lex_rank <= 20
      ), qv AS (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qvv
        FROM embeddings
      ), withn AS (
        SELECT vec_id, qvv,
               list_sum(list_transform(generate_series(1, len(qvv)), i -> qvv[i] * qvv[i])) AS qq
        FROM qv
      ), scored_d AS (
        SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
               CAST(list_sum(list_transform(generate_series(1, len(a.qvv)),
                    i -> a.qvv[i] * b.qvv[i])) AS DOUBLE)
                 / (SQRT(CAST(a.qq AS DOUBLE)) * SQRT(CAST(b.qq AS DOUBLE))) AS score
        FROM withn a JOIN withn b ON a.vec_id % 37 = 0 AND a.vec_id < 3700
          AND a.vec_id <> b.vec_id
      ), dense AS (
        SELECT query_id, doc_id, dense_rank FROM (
          SELECT query_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS dense_rank
          FROM scored_d)
        WHERE dense_rank <= 20
      ), fused AS (
        SELECT COALESCE(l.query_id, dn.query_id) AS query_id,
               COALESCE(l.doc_id, dn.doc_id) AS doc_id,
               CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
               CAST(COALESCE(dn.dense_rank, 0) AS BIGINT) AS dense_rank
        FROM lex l FULL OUTER JOIN dense dn
          ON l.query_id = dn.query_id AND l.doc_id = dn.doc_id
      ), rrf AS (
        SELECT query_id, doc_id, lex_rank, dense_rank,
               (CASE WHEN lex_rank > 0
                     THEN CAST(1 AS DOUBLE) / (lex_rank + 60)
                     ELSE CAST(0 AS DOUBLE) END)
             + (CASE WHEN dense_rank > 0
                     THEN CAST(1 AS DOUBLE) / (dense_rank + 60)
                     ELSE CAST(0 AS DOUBLE) END) AS rrf_score
        FROM fused
      ), out AS (
        SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY rrf_score DESC, doc_id) AS rank
        FROM rrf)
      SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
             CAST(rank AS BIGINT) AS rank
      FROM out WHERE rank <= 10
      ORDER BY query_id, rank"""))

  val all: Map[String, Q] = Map(
    "q88_hybrid_rrf" -> q88,
    "q168_hybrid_maxpassage_rrf" -> q168,
  )
}
