package graft.queries

/** Embedding similarity-search operators over the `embeddings` table —
  * brute-force cosine top-k baseline plus LSH-bucketed ANN.
  */
object VectorOps {
  val all: Map[String, Q] = Map()
}
