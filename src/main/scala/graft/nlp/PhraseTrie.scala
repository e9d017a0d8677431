package graft.nlp

import scala.collection.mutable

/** Allocation-free longest-match phrase lookup for dictionary NER.
  *
  * The naive sliding-window `Set[Vector[String]]` lookup allocates two
  * vectors per (position, window) pair and hashes them — the kernel's
  * dominant allocation site at 32 threads (GC-bound scaling). The trie walks
  * token-by-token using either the lemma or the lowercased text as the edge
  * key, allocating nothing on the hot path. This is the executor-side
  * "broadcast trie dictionary" of the north star.
  */
final class PhraseTrie private () {
  private val children = new java.util.HashMap[String, PhraseTrie]()
  private var terminal = false

  private def insert(tokens: Seq[String]): Unit = {
    var node = this
    tokens.foreach { t =>
      var next = node.children.get(t)
      if (next == null) { next = new PhraseTrie(); node.children.put(t, next) }
      node = next
    }
    node.terminal = true
  }

  /** Longest match starting at `i`, trying lemma and lowercase-text edges at
    * every level. Returns the match length (0 = no match). */
  def longestMatch(lemmas: Array[String], lowers: Array[String], i: Int, n: Int): Int = {
    var best = 0
    // DFS over the (tiny) branching between lemma/text edges
    def go(node: PhraseTrie, depth: Int): Unit = {
      if (node.terminal && depth > best) best = depth
      val k = i + depth
      if (k < n) {
        val byLemma = node.children.get(lemmas(k))
        if (byLemma != null) go(byLemma, depth + 1)
        val lt = lowers(k)
        if (lt != lemmas(k)) {
          val byText = node.children.get(lt)
          if (byText != null && (byText ne byLemma)) go(byText, depth + 1)
        }
      }
    }
    go(this, 0)
    best
  }
}

object PhraseTrie {
  def apply(phrases: Iterable[Vector[String]]): PhraseTrie = {
    val t = new PhraseTrie()
    phrases.foreach(t.insert(_))
    t
  }
}
