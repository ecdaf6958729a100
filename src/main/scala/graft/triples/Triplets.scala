package graft.triples

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, NullNode, ObjectNode}
import graft.model.WikidataJson
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import scala.jdk.CollectionConverters._

/** P6 — qualifier + reference sub-triples, matching the reference notebook's
  * `get_triplets` (notebooks/Data_Sample_Preparation.ipynb cell 5) applied
  * after its exact cleanup chain (cell 3): remove
  * hash/snaktype/type/entity-type/numeric-id/qualifiers-order/snaks-order,
  * collapse single-key non-[PQ]\d+ dicts, remove id. Unlike the statement
  * extractor (P5), this path does NOT filter ranks — the notebook walks raw
  * claims — and values that are neither entity id, time, nor amount stay as
  * their (cleaned) JSON subtree (monolingualtext, coordinates), or null for
  * novalue/somevalue snaks.
  *
  * Works on the raw parsed JsonNode so dict-valued outputs are byte-faithful
  * subtrees of the input, never re-rendered approximations. (The notebook's
  * `add_labels` step only wraps entity-id datavalues as {id, labels} which
  * `get_value` immediately unwraps — a no-op composite, so it is skipped.)
  */
object Triplets {

  final case class SubTriple(pid: String, value: JsonNode)
  final case class Triplet(pid: String, value: JsonNode,
                           qualifiers: Seq[SubTriple], references: Seq[SubTriple])

  private val dropKeys = Set("hash", "snaktype", "type", "entity-type",
    "numeric-id", "qualifiers-order", "snaks-order")
  private val pqKey = "^[PQ]\\d+$".r

  private def removeKeys(n: JsonNode, keys: Set[String]): JsonNode =
    if (n.isObject) {
      val out = WikidataJson.mapper.createObjectNode()
      n.properties().asScala.foreach { e =>
        if (!keys.contains(e.getKey)) out.set[ObjectNode](e.getKey, removeKeys(e.getValue, keys))
      }
      out
    } else if (n.isArray) {
      val out = WikidataJson.mapper.createArrayNode()
      n.elements().asScala.foreach(x => out.add(removeKeys(x, keys)))
      out
    } else n

  private def collapse(n: JsonNode): JsonNode =
    if (n.isObject) {
      if (n.size == 1 && !pqKey.matches(n.fieldNames().next()))
        collapse(n.elements().next())
      else {
        val out = WikidataJson.mapper.createObjectNode()
        n.properties().asScala.foreach(e => out.set[ObjectNode](e.getKey, collapse(e.getValue)))
        out
      }
    } else if (n.isArray) {
      val out = WikidataJson.mapper.createArrayNode()
      n.elements().asScala.foreach(x => out.add(collapse(x)))
      out
    } else n

  /** The notebook's get_value over a CLEANED snak (sequential unwraps). */
  private def getValue(snak: JsonNode): JsonNode = {
    if (snak == null || !snak.isObject || !snak.has("datavalue"))
      return NullNode.getInstance()
    var v = snak.get("datavalue")
    if (v.isObject && v.has("id")) v = v.get("id")
    if (v.isObject && v.has("time")) v = v.get("time")
    if (v.isObject && v.has("amount")) v = v.get("amount")
    v
  }

  private def subTriples(group: JsonNode): Seq[SubTriple] =
    if (group == null || !group.isObject) Seq.empty
    else group.properties().asScala.toSeq.flatMap { e =>
      e.getValue.elements().asScala.toSeq.map(sn => SubTriple(e.getKey, getValue(sn)))
    }

  /** All triplets of one raw dump-line item, claim order preserved. */
  def fromItem(item: JsonNode): Seq[Triplet] = {
    val claims = item.path("claims")
    if (!claims.isObject) return Seq.empty
    val cleaned = removeKeys(collapse(removeKeys(claims, dropKeys)), Set("id"))
    cleaned.properties().asScala.toSeq.flatMap { e =>
      val pid = e.getKey
      e.getValue.elements().asScala.toSeq.map { cl =>
        val refs = Option(cl.get("references")).toSeq
          .flatMap(_.elements().asScala.toSeq)
          .flatMap(subTriples)
        Triplet(pid, getValue(cl.path("mainsnak")), subTriples(cl.get("qualifiers")), refs)
      }
    }
  }

  /** The notebook's output shape (for golden comparison). */
  def toJson(ts: Seq[Triplet]): ArrayNode = {
    val m = WikidataJson.mapper
    val arr = m.createArrayNode()
    ts.foreach { t =>
      val o = m.createObjectNode()
      o.set[ObjectNode]("Property", m.getNodeFactory.textNode(t.pid))
      o.set[ObjectNode]("Value", t.value)
      val refs = m.createArrayNode()
      t.references.foreach { s =>
        val ro = m.createObjectNode()
        ro.set[ObjectNode]("Property", m.getNodeFactory.textNode(s.pid))
        ro.set[ObjectNode]("Value", s.value)
        refs.add(ro)
      }
      o.set[ObjectNode]("references", refs)
      val quals = m.createArrayNode()
      t.qualifiers.foreach { s =>
        val qo = m.createObjectNode()
        qo.set[ObjectNode]("Property", m.getNodeFactory.textNode(s.pid))
        qo.set[ObjectNode]("Value", s.value)
        quals.add(qo)
      }
      o.set[ObjectNode]("qualifiers", quals)
      arr.add(o)
    }
    arr
  }

  private def renderValue(v: JsonNode): String =
    if (v == null || v.isNull) null
    else if (v.isTextual) v.asText()
    else WikidataJson.mapper.writeValueAsString(v)

  /** Distributed flattened form: one row per main/qualifier/reference
    * sub-triple — (qid, claim_idx, pid, part, sub_pid, value). Deterministic
    * ids derive from (qid, claim_idx), never partition order. A narrow
    * flatMap: no shuffle; at corpus scale this pipelines into the scan.
    */
  def rows(spark: SparkSession, lines: Dataset[String]): DataFrame = {
    import spark.implicits._
    lines.flatMap { line =>
      WikidataJson.parseLine(line).toSeq.flatMap { item =>
        val qid = item.path("id").asText("")
        fromItem(item).zipWithIndex.flatMap { case (t, i) =>
          val main = Seq((qid, i, t.pid, "main", t.pid, renderValue(t.value)))
          val quals = t.qualifiers.map(s => (qid, i, t.pid, "qualifier", s.pid, renderValue(s.value)))
          val refs = t.references.map(s => (qid, i, t.pid, "reference", s.pid, renderValue(s.value)))
          main ++ quals ++ refs
        }
      }
    }.toDF("qid", "claim_idx", "pid", "part", "sub_pid", "value")
  }
}
