package graft.mention

import scala.collection.mutable

/** A found mention: [begin, end) char span, matched surface, candidate QIDs. */
final case class Mention(surface: String, qids: Seq[String], begin: Int, end: Int)

/** Aho-Corasick automaton over the entity label+alias dictionary
  * (SURVEY.md §7.1 stage 2). Built once on the driver from the label
  * dimension and broadcast; matching is a linear scan per document.
  *
  * Match policy: leftmost-longest, non-overlapping, with word-boundary
  * guards (a label must not continue into adjacent letters/digits) —
  * deterministic regardless of dictionary order.
  *
  * Scale: the automaton is O(total label chars) in memory (~100 MB for the
  * full 9.2M-label Wikidata dictionary) — within executor broadcast budget;
  * if the dictionary outgrows broadcast, shard the trie by surface hash and
  * run N passes (noted in SURVEY.md §7.4).
  */
final class AhoCorasick private (
    goto: Array[mutable.HashMap[Char, Int]],
    fail: Array[Int],
    out: Array[List[Int]], // pattern indices ending at this node
    patterns: Array[String],
    payloads: Array[Array[String]]) extends Serializable {

  private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** All raw matches (begin, end, patternIdx), boundary-filtered. */
  private def rawMatches(text: String): mutable.ArrayBuffer[(Int, Int, Int)] = {
    val hits = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !goto(state).contains(c)) state = fail(state)
      state = goto(state).getOrElse(c, 0)
      var s = state
      while (s != 0) {
        out(s).foreach { p =>
          val begin = i - patterns(p).length + 1
          val okLeft = begin == 0 || !isWordChar(text.charAt(begin - 1)) || !isWordChar(patterns(p).charAt(0))
          val okRight = i + 1 >= text.length || !isWordChar(text.charAt(i + 1)) ||
            !isWordChar(patterns(p).charAt(patterns(p).length - 1))
          if (okLeft && okRight) hits += ((begin, i + 1, p))
        }
        s = fail(s)
      }
      i += 1
    }
    hits
  }

  /** Leftmost-longest non-overlapping mentions. */
  def findMentions(text: String): Seq[Mention] = {
    val hits = rawMatches(text)
    if (hits.isEmpty) return Seq.empty
    // sort by begin asc, length desc → greedy pick
    val sorted = hits.sortBy { case (b, e, _) => (b, -(e - b)) }
    val res = mutable.ArrayBuffer.empty[Mention]
    var lastEnd = 0
    sorted.foreach { case (b, e, p) =>
      if (b >= lastEnd) {
        res += Mention(patterns(p), payloads(p).toSeq, b, e)
        lastEnd = e
      }
    }
    res.toSeq
  }
}

object AhoCorasick {

  /** Build from (surface → candidate QIDs). Empty surfaces are ignored. */
  def build(dictionary: Iterable[(String, Seq[String])]): AhoCorasick = {
    val entries = dictionary.filter(_._1.nonEmpty).toArray
    val patterns = entries.map(_._1)
    val payloads = entries.map(_._2.toArray)

    val goto = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val outB = mutable.ArrayBuffer(List.empty[Int])

    patterns.zipWithIndex.foreach { case (p, pi) =>
      var state = 0
      p.foreach { c =>
        goto(state).get(c) match {
          case Some(nxt) => state = nxt
          case None =>
            goto += mutable.HashMap.empty[Char, Int]
            outB += Nil
            goto(state)(c) = goto.length - 1
            state = goto.length - 1
        }
      }
      outB(state) = pi :: outB(state)
    }

    val fail = Array.fill(goto.length)(0)
    val queue = mutable.Queue.empty[Int]
    goto(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto(r).foreach { case (c, s) =>
        queue.enqueue(s)
        var st = fail(r)
        while (st != 0 && !goto(st).contains(c)) st = fail(st)
        fail(s) = if (goto(st).contains(c) && goto(st)(c) != s) goto(st)(c) else 0
        // note: out chains are followed via fail links at match time
      }
    }
    new AhoCorasick(goto.toArray, fail, outB.toArray, patterns, payloads)
  }
}
