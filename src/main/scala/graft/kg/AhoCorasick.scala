package graft.kg

import scala.collection.mutable

/** Multi-pattern string matcher (Aho–Corasick automaton).
  *
  * The engine's mention detector scans every page against the broadcast
  * alias dictionary — the reference's exact/ignore_case TargetNodeMatcher
  * applied at corpus scale (SURVEY.md §7.1). A per-pattern regex union
  * would be O(|dict|) per position; the automaton is O(len + matches)
  * regardless of dictionary size, which is what survives a 10^7-alias
  * dictionary × 10^12 pages. Built once per executor partition from the
  * broadcast pattern list.
  *
  * Case-insensitive matching is achieved by constructing over lowercased
  * patterns and scanning lowercased text.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {

  // Trie as growable arrays: children maps, fail links, output pattern ids.
  private val children = mutable.ArrayBuffer[mutable.HashMap[Char, Int]](mutable.HashMap.empty)
  private val fail = mutable.ArrayBuffer[Int](0)
  private val out = mutable.ArrayBuffer[List[Int]](Nil)

  locally {
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var node = 0
      p.foreach { ch =>
        node = children(node).getOrElseUpdate(ch, {
          children += mutable.HashMap.empty
          fail += 0
          out += Nil
          children.size - 1
        })
      }
      out(node) = idx :: out(node)
    }
    // BFS fail links
    val queue = mutable.Queue[Int]()
    children(0).values.foreach { c => fail(c) = 0; queue.enqueue(c) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).get(ch).filter(_ != v).getOrElse(0)
        out(v) = out(v) ++ out(fail(v))
        queue.enqueue(v)
      }
    }
  }

  /** All occurrences as (start, endExclusive, patternIdx). */
  def findAll(text: String): IndexedSeq[(Int, Int, Int)] = {
    val res = mutable.ArrayBuffer[(Int, Int, Int)]()
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !children(node).contains(ch)) node = fail(node)
      node = children(node).getOrElse(ch, 0)
      out(node).foreach { idx =>
        val len = patterns(idx).length
        res += ((i - len + 1, i + 1, idx))
      }
      i += 1
    }
    res.toIndexedSeq
  }

  /** Occurrences that sit on word boundaries (neither neighbor char is a
    * letter/digit), WITHOUT the leftmost-longest reduction. This is the
    * per-shard emission of the sharded scan ([[Extract.factsSharded]]):
    * greedy tiling is NOT compositional across dictionary shards (a
    * shard-local winner can consume a span that a longer alias from
    * another shard claims globally), so shards must surface every
    * boundary match and the tiling runs once over the union.
    */
  def findBoundaryMatches(text: String): IndexedSeq[(Int, Int, Int)] =
    findAll(text).filter { case (s, e, _) =>
      (s == 0 || !Character.isLetterOrDigit(text.charAt(s - 1))) &&
      (e == text.length || !Character.isLetterOrDigit(text.charAt(e)))
    }

  /** Occurrences that sit on word boundaries (neither neighbor char is a
    * letter/digit), reduced to non-overlapping leftmost-longest spans —
    * so "shared widget 1" never fires inside "shared widget 10" and a
    * longer alias wins over a prefix alias at the same start.
    */
  def findMentions(text: String): IndexedSeq[(Int, Int, Int)] =
    AhoCorasick.leftmostLongest(findBoundaryMatches(text))
}

object AhoCorasick {
  /** Leftmost-longest tiling over boundary-filtered candidate spans:
    * sort by (start, -length), then keep each span whose start is not
    * inside an already-kept span. Exposed separately so the sharded scan
    * can apply the IDENTICAL selection to the union of per-shard
    * candidates that [[AhoCorasick.findMentions]] applies to a single
    * automaton's matches (the `A` tiebreak is unreachable for distinct
    * patterns — two distinct patterns cannot share both start and
    * length — but keeps the sort total).
    */
  def leftmostLongest[A: Ordering](ms: IndexedSeq[(Int, Int, A)]): IndexedSeq[(Int, Int, A)] = {
    val sorted = ms.sortBy { case (s, e, a) => (s, -(e - s), a) }
    val kept = mutable.ArrayBuffer[(Int, Int, A)]()
    var lastEnd = -1
    sorted.foreach { m =>
      if (m._1 >= lastEnd) { kept += m; lastEnd = m._2 }
    }
    kept.toIndexedSeq
  }
}
