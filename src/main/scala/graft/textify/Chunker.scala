package graft.textify

import graft.model.Entity
import scala.collection.mutable

/** Tokenizer with HF-style character offsets. The sandbox has no HF
  * tokenizer (SURVEY.md §7.4), so [[SimpleTokenizer]] is the deterministic
  * stand-in behind the same interface the reference's chunker consumes
  * (token ids are irrelevant — only counts and offsets matter).
  */
trait OffsetTokenizer extends Serializable {
  /** (start, end) char offsets per token, in order. */
  def tokenize(text: String): IndexedSeq[(Int, Int)]
}

/** Whitespace-delimited, BPE-ish: non-space runs split into ≤`maxPiece`-char
  * pieces so long words cost multiple tokens like a subword vocab would.
  */
final class SimpleTokenizer(maxPiece: Int = 8) extends OffsetTokenizer {
  def tokenize(text: String): IndexedSeq[(Int, Int)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    val n = text.length
    while (i < n) {
      if (Character.isWhitespace(text.charAt(i))) i += 1
      else {
        var j = i
        while (j < n && !Character.isWhitespace(text.charAt(j))) j += 1
        var s = i
        while (s < j) {
          val e = math.min(s + maxPiece, j)
          out += ((s, e))
          s = e
        }
        i = j
      }
    }
    out.toIndexedSeq
  }
}

/** Greedy token-budget chunking — semantics of the reference's `chunk_text`
  * (ref: src/wikidataEmbed.py:303-365):
  *  - full text under budget → one chunk;
  *  - label+description alone at/over budget → single truncated chunk
  *    (sliced out of the FULL text using the description-only offsets,
  *    exactly like the reference);
  *  - else accumulate claims property-by-property, emitting a truncated
  *    chunk on overflow; an oversized single claim is emitted alone.
  */
object Chunker {

  def chunkText(textifier: Textifier, entity: Entity, tokenizer: OffsetTokenizer,
                maxLength: Int = 500): Seq[String] = {
    val fullText = textifier.entityToText(entity)
    val fullTokens = tokenizer.tokenize(fullText)
    if (fullTokens.length < maxLength) return Seq(fullText)

    val descText = textifier.entityToText(entity, Some(Seq.empty))
    val descTokens = tokenizer.tokenize(descText)
    if (descTokens.length >= maxLength)
      return Seq(fullText.substring(descTokens(0)._1, descTokens(maxLength - 1)._2))

    val properties = textifier.propertiesToDict(entity.claims)
    val chunks = mutable.ArrayBuffer.empty[String]
    var chunkClaims = Vector.empty[(String, Seq[RenderedClaim])]

    properties.foreach { case (claim, value) =>
      val currentChunkClaims = chunkClaims :+ (claim -> value)
      val text = textifier.entityToText(entity, Some(currentChunkClaims))
      val tokens = tokenizer.tokenize(text)
      if (tokens.length >= maxLength) {
        chunks += text.substring(tokens(0)._1, tokens(maxLength - 1)._2)
        chunkClaims =
          if (chunkClaims.isEmpty) Vector.empty // oversized claim already emitted truncated
          else Vector(claim -> value)           // claim starts the next chunk untrimmed
      } else chunkClaims = currentChunkClaims
    }

    if (chunkClaims.nonEmpty) {
      val text = textifier.entityToText(entity, Some(chunkClaims))
      val tokens = tokenizer.tokenize(text)
      val (start, end) =
        if (tokens.length >= maxLength) (tokens(0)._1, tokens(maxLength - 1)._2)
        else (tokens(0)._1, tokens(tokens.length - 1)._2)
      chunks += text.substring(start, end)
    }
    chunks.toSeq
  }
}
