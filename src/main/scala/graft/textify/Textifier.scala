package graft.textify

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.{Claim, ClaimGroup, Entity, QualifierGroup, Snak}
import scala.collection.mutable

/** Entity → text rendering, the semantics of the reference's
  * `WikidataTextifier` (ref: src/wikidataEmbed.py:25-171).
  *
  * `labelOf` abstracts the reference's row-at-a-time
  * `WikidataEntity.get_entity(id).label` point lookups
  * (ref: src/wikidataEmbed.py:72-75,115-122): `None` = entity absent (claim
  * dropped), `Some("")` = entity present with empty label (also dropped by
  * Python truthiness). In distributed use the function closes over a
  * broadcast label map; graft.triples hoists the same lookups into joins.
  *
  * Pure and deterministic; safe inside `Dataset.map`.
  */
class Textifier(val lang: LangVariant, labelOf: String => Option[String]) extends Serializable {

  // thread-local shared mapper: a per-instance mapper made "new Textifier per
  // row" allocate an ObjectMapper per row, and a JVM-shared one contends on
  // Jackson's symbol-table locks at high thread counts
  private def parse(json: String): JsonNode = graft.model.WikidataJson.mapper.readTree(json)

  /** `mainsnak_to_value` (ref: src/wikidataEmbed.py:104-147). Returned
    * Option is Python truthiness: callers must drop empty strings too.
    */
  def mainsnakToValue(snak: Snak): Option[String] = snak.snaktype match {
    case "value" =>
      if (snak.valueJson == null) return None
      snak.datatype match {
        case "wikibase-item" | "wikibase-property" =>
          val id = parse(snak.valueJson).get("id").asText()
          labelOf(id)
        case "monolingualtext" =>
          Some(parse(snak.valueJson).get("text").asText())
        case "string" =>
          Some(parse(snak.valueJson).asText())
        case "time" =>
          val v = parse(snak.valueJson)
          val raw = v.get("time").asText()
          try Some(TimeText.toText(raw, v.get("precision").asInt(),
            v.path("calendarmodel").asText("http://www.wikidata.org/entity/Q1985786"), lang))
          catch { case _: Exception => Some(raw) }
        case "quantity" =>
          val v = parse(snak.valueJson)
          try Some(quantityToText(v))
          catch { case _: Exception => Some(v.get("amount").asText()) }
        case _ => None
      }
    case "novalue" => Some(lang.novalue)
    case _ => None
  }

  /** `quantity_to_text` (ref: src/wikidataEmbed.py:149-171): amount string
    * kept verbatim (incl. leading '+'); unit '1' → bare amount; unit URI →
    * QID label when the entity exists and has a non-empty label, the raw URI
    * when the entity is absent, omitted when the label is empty.
    */
  def quantityToText(v: JsonNode): String = {
    val amount = v.get("amount").asText()
    val unitRaw = if (v.has("unit") && !v.get("unit").isNull) v.get("unit").asText() else null
    if (unitRaw == null) throw new IllegalArgumentException("missing unit") // ref: AttributeError → amount fallback
    val unit: String =
      if (unitRaw == "1") null
      else {
        val qid = unitRaw.substring(unitRaw.lastIndexOf('/') + 1)
        labelOf(qid) match {
          case Some(lbl) => lbl       // may be "" → falsy → omitted below
          case None      => unitRaw   // entity absent: URI kept (ref keeps `unit`)
        }
      }
    amount + (if (unit != null && unit.nonEmpty) s" $unit" else "")
  }

  /** `qualifiers_to_dict` (ref: src/wikidataEmbed.py:78-102). */
  def qualifiersToDict(qualifiers: Seq[QualifierGroup]): Seq[(String, Seq[String])] = {
    val out = mutable.LinkedHashMap.empty[String, Seq[String]]
    qualifiers.foreach { qg =>
      val qData = qg.snaks.flatMap(mainsnakToValue).filter(_.nonEmpty)
      if (qData.nonEmpty) labelOf(qg.pid).foreach { pl => out.put(pl, qData) }
    }
    out.toSeq
  }

  /** `properties_to_dict` with the order-sensitive preferred-rank reset
    * (ref: src/wikidataEmbed.py:41-76): first preferred claim clears the
    * accumulated normals; afterwards only preferred are kept.
    */
  def propertiesToDict(claims: Seq[ClaimGroup]): Seq[(String, Seq[RenderedClaim])] = {
    val out = mutable.LinkedHashMap.empty[String, Seq[RenderedClaim]]
    claims.foreach { cg =>
      val pData = mutable.ArrayBuffer.empty[RenderedClaim]
      var rankPreferredFound = false
      cg.claims.foreach { c: Claim =>
        val value = mainsnakToValue(c.mainsnak)
        val quals = qualifiersToDict(c.qualifiers)
        val rank = Option(c.rank).getOrElse("normal").toLowerCase
        if (value.exists(_.nonEmpty)) {
          if ((!rankPreferredFound && rank == "normal") || rank == "preferred") {
            if (!rankPreferredFound && rank == "preferred") {
              rankPreferredFound = true
              pData.clear()
            }
            pData += RenderedClaim(value.get, quals)
          }
        }
      }
      if (pData.nonEmpty) labelOf(cg.pid).foreach { pl => out.put(pl, pData.toSeq) }
    }
    out.toSeq
  }

  /** `entity_to_text` (ref: src/wikidataEmbed.py:25-39). */
  def entityToText(entity: Entity, properties: Option[Seq[(String, Seq[RenderedClaim])]] = None): String = {
    val props = properties.getOrElse(propertiesToDict(entity.claims))
    lang.mergeEntityText(entity.label, entity.description, entity.aliases, props)
  }
}
