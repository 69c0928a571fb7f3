package graft.functions

/** The greedy BPE merge fold — the ONE definition shared by the fit
  * iterations (graft.operators.Bpe), the `BpeEncode` expression, and
  * mirrored verbatim by the DuckDB oracle's list_reduce fold: extend the
  * output; when the last emitted symbol is `l` and the incoming one is
  * `r`, replace the last with `l+r` (the merged symbol cannot chain-merge
  * with the NEXT incoming `r`, because it no longer equals `l`).
  */
object BpeMerge {

  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == l && syms(i) == r)
        out(out.length - 1) = l + r
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Encode one word under the ordered merge list (chars -> k passes). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = word.toCharArray.map(_.toString)
    merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
    syms
  }
}
