package graft

/** Independent naive BPE reference (test-only): the same declared
  * semantics as the BpeEncode kernel — words are non-empty single-space
  * splits; per word, repeatedly merge all non-overlapping left-to-right
  * occurrences of the present adjacent pair with the lowest merge rank —
  * written functionally (immutable lists, recursion) rather than the
  * kernel's primitive-loop style, so a transcription error in either
  * implementation breaks the ScalaCheck parity property.
  */
object NaiveBpe {

  def encode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank: Map[(String, String), Int] =
      merges.zipWithIndex.reverse.toMap // reverse → first occurrence wins
    def mergeOnce(toks: List[String], p: (String, String)): List[String] =
      toks match {
        case a :: b :: rest if (a, b) == p => (a + b) :: mergeOnce(rest, p)
        case a :: rest => a :: mergeOnce(rest, p)
        case Nil => Nil
      }
    @annotation.tailrec
    def encodeWord(toks: List[String]): List[String] = {
      val present = toks.zip(toks.drop(1)).filter(rank.contains)
      if (present.isEmpty) toks
      else encodeWord(mergeOnce(toks, present.minBy(rank)))
    }
    text.split(" ").toSeq.filter(_.nonEmpty)
      .flatMap(w => encodeWord(w.toList.map(_.toString)))
  }
}
