package graft.queries

/** Text-analysis / dedup operators over the `documents` table — filled in
  * as each operator lands (dedup, lang-id, quality scoring, fingerprints).
  */
object TextOps {
  val all: Map[String, Q] = Map()
}
