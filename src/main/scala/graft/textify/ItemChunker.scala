package graft.textify

import com.fasterxml.jackson.databind.JsonNode
import graft.model.WikidataJson
import scala.jdk.CollectionConverters._

/** T7 — the reference's ALTERNATE chunker: statement-lines-per-chunk with a
  * `Label:/Description:` header (ref:
  * …wikidata_datadump_item_textification.py:332-540), as opposed to the
  * token-budget chunker (T6, [[Chunker]]). Golden-pinned against executing
  * the reference's own functions; its quirks are reproduced deliberately:
  *
  *  - `n_statements` counts `claims.items()` TUPLES — always 2 per property
  *    (`sum(len(claim) for claim in claims)`, :533);
  *  - the final partial chunk increments the chunk counter BEFORE using it,
  *    so its id skips one (ids 0..k-1, then k+1; a lone partial chunk gets
  *    id 1, never 0) (:466);
  *  - the same-pid comma-join branch is dead code (`pid_curr` is only
  *    assigned inside the branch that requires it to be non-None, :420-426),
  *    so every claim renders as its own `\n{prop_label}: {value_label}` line;
  *  - a missing property label renders as the literal `None` (:384-394);
  *  - `item_str` starts with `\n`, so line 0 of the body is empty and
  *    `n_lines` counts it.
  */
object ItemChunker {

  final case class ItemChunk(qid: String, chunk_id: Int, qid_chunk: String,
                             n_statements: Int, n_sitelinks: Int, n_descriptions: Int,
                             n_lines: Int, item_str: String)

  /** get_value_label (:332-382): the scalarization ladder, then QID values
    * resolve through the label store (b'-prefix / trailing-quote strip) and
    * missing entities drop the claim; quotes flatten to apostrophes.
    * Note: only `entity-type == item` dicts and plain strings take the QID
    * path — a wikibase-PROPERTY value keeps its raw id.
    */
  def valueLabel(valueNode: JsonNode, labelOf: String => Option[String]): Option[String] = {
    val ladder = WikidataJson.scalarizeValue(valueNode)
    if (ladder.isEmpty) return None
    val qidCandidate: Option[String] =
      if (valueNode.isTextual) Some(valueNode.asText())
      else if (valueNode.isObject && valueNode.path("entity-type").asText("") == "item"
        && valueNode.has("id")) Some(valueNode.get("id").asText())
      else None
    val resolved = qidCandidate match {
      case Some(v) if WikidataJson.looksLikeQid(v) =>
        labelOf(v).map { lbl =>
          var l = lbl
          if (l.startsWith("b'")) l = l.substring(2)
          if (l.nonEmpty && l.endsWith("'")) l = l.dropRight(1)
          l
        } // missing entity -> None -> claim skipped
      case _ => ladder
    }
    resolved.map(_.replace("\"", "'"))
  }

  /** convert_props_to_string (:398-428): one line per claim with a datavalue
    * and a resolvable value label.
    */
  def propsToString(pid: String, claimList: JsonNode,
                    labelOf: String => Option[String]): String = {
    val sb = new StringBuilder
    claimList.elements().asScala.foreach { c =>
      val ms = c.path("mainsnak")
      if (ms.has("datavalue")) {
        val vnode = ms.get("datavalue").path("value")
        valueLabel(vnode, labelOf).foreach { vl =>
          val propLabel = labelOf(pid).map(_.replace("\"", "'")).getOrElse("None")
          sb.append(s"\n$propLabel: $vl")
        }
      }
    }
    sb.toString
  }

  /** chunk_item_string (:431-483) — including the skipped-id quirk. */
  def chunkItemString(itemStr: String, qid: String, header: String,
                      nStatements: Int, nSitelinks: Int, nDescriptions: Int,
                      chunksize: Int = 100): Seq[ItemChunk] = {
    val lines = itemStr.split("\n", -1)
    val nLines = lines.length
    val out = scala.collection.mutable.ArrayBuffer.empty[ItemChunk]
    var k = 0
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    def emit(id: Int): Unit = {
      out += ItemChunk(qid, id, s"${qid}_$id", nStatements, nSitelinks,
        nDescriptions, nLines, header + buf.mkString("\n"))
      buf.clear()
    }
    lines.foreach { line =>
      buf += line
      if (buf.length >= chunksize) { emit(k); k += 1 }
    }
    if (buf.nonEmpty) { k += 1; emit(k) } // reference quirk: id skips one
    out.toSeq
  }

  /** entity_to_item_chunks (:486-528). Caller guards `descriptions[lang]`
    * presence (the production loop's F10 check).
    */
  def entityToItemChunks(item: JsonNode, labelOf: String => Option[String],
                         lang: String = "en", chunksize: Int = 100): Seq[ItemChunk] = {
    val qid = item.path("id").asText()
    val nSitelinks = if (item.path("sitelinks").isObject) item.path("sitelinks").size() else 0
    val nDescriptions = if (item.path("descriptions").isObject) item.path("descriptions").size() else 0
    val qidLabel = {
      var l = labelOf(qid).getOrElse(
        throw new NoSuchElementException(s"label for $qid (ref crashes at .replace)"))
      if (l.startsWith("b'")) l = l.substring(2)
      if (l.nonEmpty && l.endsWith("'")) l = l.dropRight(1)
      l.replace("\"", "'")
    }
    val itemDesc = item.path("descriptions").path(lang).path("value").asText()
      .replace("\"", "'")
    val header = s"Label: $qidLabel\nDescription: $itemDesc\n"
    val claims = item.path("claims")
    val nStatements = if (claims.isObject) 2 * claims.size() else 0
    val itemStr = if (!claims.isObject) ""
      else claims.properties().iterator().asScala
        .map(e => propsToString(e.getKey, e.getValue, labelOf)).mkString("")
    chunkItemString(itemStr, qid, header, nStatements, nSitelinks, nDescriptions, chunksize)
  }

  /** Total variant for distributed use: a label-less item yields NO chunks
    * (the drop-the-row tolerance every corpus path uses) instead of the
    * reference-parity crash in [[entityToItemChunks]]. Wire THIS into Spark
    * stages — one dirty entity must not kill a corpus-scale job; keep the
    * throwing form only for golden parity.
    */
  def entityToItemChunksSafe(item: JsonNode, labelOf: String => Option[String],
                             lang: String = "en", chunksize: Int = 100): Seq[ItemChunk] = {
    val qid = item.path("id").asText()
    if (qid.isEmpty || labelOf(qid).isEmpty) Seq.empty
    else entityToItemChunks(item, labelOf, lang, chunksize)
  }
}
