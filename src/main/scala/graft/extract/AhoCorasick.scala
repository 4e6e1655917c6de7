package graft.extract

import scala.collection.mutable

/** Classic Aho-Corasick multi-pattern string matcher (Aho & Corasick,
  * CACM 1975). One pass over the text regardless of dictionary size —
  * the right asymptotics for mention detection over 10^12 turns with a
  * 10^6-surface dictionary. Built once per partition from a broadcast
  * pattern array (north_star: "mapPartitions over broadcast
  * dictionary/alias tries").
  *
  * Graft of the reference's per-point nearest-road-feature assignment
  * (/root/reference/src/TCXParser.jl:188-203): a side-dictionary lookup
  * applied to every record.
  */
final class AhoCorasick private (
    next: Array[mutable.LongMap[Int]], // node -> (char -> node)
    fail: Array[Int],
    // patterns ending at each node: (patternId, patternLength)
    out: Array[List[(Long, Int)]]
) extends Serializable {
  import AhoCorasick.Match

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c)

  /** All matches with word-boundary guards, then leftmost-longest
    * non-overlapping selection (the standard dictionary-mention policy;
    * also what keeps "Delta Works" from double-counting inside a longer
    * surface).
    */
  def findMentions(text: String): List[Match] = {
    val all = mutable.ArrayBuffer.empty[Match]
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i).toLong
      while (node != 0 && !next(node).contains(c)) node = fail(node)
      node = next(node).getOrElse(c, 0)
      var o = out(node)
      while (o.nonEmpty) {
        val (id, len) = o.head
        val begin = i - len + 1
        val okLeft = begin == 0 || !isWordChar(text.charAt(begin - 1))
        val okRight = i == text.length - 1 || !isWordChar(text.charAt(i + 1))
        if (okLeft && okRight) all += Match(begin, i + 1, id)
        o = o.tail
      }
      i += 1
    }
    // leftmost-longest, non-overlapping
    val sorted = all.sortBy(m => (m.begin, -(m.end - m.begin)))
    val res = mutable.ListBuffer.empty[Match]
    var lastEnd = 0
    for (m <- sorted) if (m.begin >= lastEnd) { res += m; lastEnd = m.end }
    res.toList
  }
}

object AhoCorasick {

  final case class Match(begin: Int, end: Int, id: Long)

  def build(patterns: Iterable[(String, Long)]): AhoCorasick = {
    val next = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val outB = mutable.ArrayBuffer(List.empty[(Long, Int)])

    for ((p, id) <- patterns if p.nonEmpty) {
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i).toLong
        node = next(node).getOrElseUpdate(c, {
          next += mutable.LongMap.empty[Int]
          outB += Nil
          next.size - 1
        })
        i += 1
      }
      outB(node) = (id, p.length) :: outB(node)
    }

    val n = next.size
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    next(0).foreach { case (_, v) => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        outB(v) = outB(v) ::: outB(fail(v))
        queue += v
      }
    }
    new AhoCorasick(next.toArray, fail, outB.toArray)
  }
}
