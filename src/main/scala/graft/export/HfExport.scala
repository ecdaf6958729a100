package graft.export

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model.WikidataJson
import graft.pipeline.PagePayload
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Stage 6 — the reference's Hugging-Face dataset export (S13 row semantics,
  * ref: docker/6_Push_Huggingface/run.py:27-34 over the cleaned chunk rows;
  * the one-shot equivalent is `WikidataLabels.clean_entity`,
  * src/wikidataLabelsDB.py:294-318):
  *
  *   1. key-strip the claims (`_remove_keys`, :141-156) — hash/snaktype/type/
  *      entity-type/numeric-id/qualifiers-order/snaks-order;
  *   2. collapse single-key non-[PQ]\d+ wrappers (`_clean_datavalue`,
  *      :158-177) — datavalue → its bare scalar / entity id;
  *   3. strip remaining `id` keys (statement ids);
  *   4. splice labels from the labels DB (`add_labels_batched` →
  *      `_gather_labels_ids`/`_add_labels_to_claims`, :179-291):
  *      `property-labels` and `unit-labels` appended per snak, wikibase
  *      datavalues rewritten to `{id, labels}` — a missing DB entry splices
  *      `{}` (get_labels :104-119);
  *   5. gate on ≥1 `*wiki` sitelink (`is_in_wikipedia`, :326-340 — the
  *      LABELS-DB variant: sitelink only, unlike F1's label+desc gate);
  *   6. emit one row (id, labels, descriptions, aliases, sitelinks, claims)
  *      with every non-id column a COMPACT CPython-json string
  *      (`json.dumps(..., separators=(',',':'))`, ensure_ascii default True —
  *      run.py:29-34), sitelinks badge-stripped.
  *
  * The labels DB itself is the corpus-harvested `clean_labels` dimension
  * (:320-324, populated by the reference's pass-1 notebook): per entity,
  * labels with `language` keys stripped and single-key wrappers collapsed —
  * note the faithful quirk that a single-language labels dict collapses to a
  * BARE STRING.
  *
  * Distribution shape: label resolution is a gather-join exactly like
  * TextifyStage (per page emit referenced ids → join the labels dimension →
  * regroup per page) — no broadcast of the full label table, shuffle volume
  * O(#references). Split assignment mirrors the reference's fixed-size
  * sequential chunk files (run.py:85-88, FILE_SIZE splits): a row_number
  * window over the id order. At 10^12 rows the total order becomes the
  * bottleneck — swap to hash splits (`pmod(xxhash64(id), nSplits)`) there;
  * the sequential mode is kept because it is the reference's observable
  * discipline and the golden pins it.
  */
object HfExport {

  private val chunkStripKeys = Set("hash", "snaktype", "type", "entity-type",
    "numeric-id", "qualifiers-order", "snaks-order")

  private val pqPattern = java.util.regex.Pattern.compile("^[PQ]\\d+$")

  /** `_remove_keys` (:141-156): recursively drop `keys`, order-preserving. */
  def removeKeys(n: JsonNode, keys: Set[String]): JsonNode = n match {
    case o: ObjectNode =>
      val out = WikidataJson.mapper.createObjectNode()
      o.properties().iterator().asScala.foreach { e =>
        if (!keys.contains(e.getKey)) out.set[JsonNode](e.getKey, removeKeys(e.getValue, keys))
      }
      out
    case a: ArrayNode =>
      val out = WikidataJson.mapper.createArrayNode()
      a.elements().asScala.foreach(x => out.add(removeKeys(x, keys)))
      out
    case other => other
  }

  /** `_clean_datavalue` (:158-177): a dict with exactly one key that is NOT
    * an entity/property id collapses to its (recursively cleaned) value.
    */
  def cleanDatavalue(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val names = o.properties().iterator().asScala.map(_.getKey).toSeq
      if (names.size == 1 && !pqPattern.matcher(names.head).matches())
        cleanDatavalue(o.get(names.head))
      else {
        val out = WikidataJson.mapper.createObjectNode()
        names.foreach(k => out.set[JsonNode](k, cleanDatavalue(o.get(k))))
        out
      }
    case a: ArrayNode =>
      val out = WikidataJson.mapper.createArrayNode()
      a.elements().asScala.foreach(x => out.add(cleanDatavalue(x)))
      out
    case other => other
  }

  /** `clean_labels` (:320-324): language keys stripped + wrapper collapse
    * (single-language dict → bare string, the stored-DB quirk).
    */
  def cleanLabels(labels: JsonNode): JsonNode =
    cleanDatavalue(removeKeys(labels, Set("language")))

  /** The chunk-stage claim cleanup (clean_entity steps 1-3). */
  def cleanClaims(claims: JsonNode): JsonNode =
    removeKeys(cleanDatavalue(removeKeys(claims, chunkStripKeys)), Set("id"))

  /** `_gather_labels_ids` (:179-216) over CLEANED claims: property ids, unit
    * QIDs, wikibase-item/-property datavalue ids (bare strings after the
    * collapse). Set semantics.
    */
  def gatherLabelIds(n: JsonNode): Set[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    def walk(x: JsonNode): Unit = x match {
      case o: ObjectNode =>
        if (o.has("property") && o.get("property").isTextual)
          out += o.get("property").asText()
        if (o.has("unit") && o.get("unit").isTextual && o.get("unit").asText() != "1") {
          val u = o.get("unit").asText()
          out += u.substring(u.lastIndexOf('/') + 1)
        }
        if (o.has("datatype") && o.has("datavalue") && o.get("datavalue").isTextual
          && (o.get("datatype").asText() == "wikibase-item"
            || o.get("datatype").asText() == "wikibase-property"))
          out += o.get("datavalue").asText()
        o.properties().iterator().asScala.foreach(e => walk(e.getValue))
      case a: ArrayNode => a.elements().asScala.foreach(walk)
      case _ =>
    }
    walk(n)
    out.toSet
  }

  /** `_add_labels_to_claims` (:218-268): splice `property-labels` /
    * `unit-labels` (appended, in that order) and rewrite wikibase datavalues
    * to `{id, labels}`; a missing label resolves to `{}`.
    */
  def addLabels(n: JsonNode, labelOf: String => Option[JsonNode]): JsonNode = {
    def labelsOr(id: String): JsonNode =
      labelOf(id).getOrElse(WikidataJson.mapper.createObjectNode())
    def walk(x: JsonNode): JsonNode = x match {
      case o: ObjectNode =>
        val out = WikidataJson.mapper.createObjectNode()
        o.properties().iterator().asScala.foreach(e => out.set[JsonNode](e.getKey, e.getValue))
        if (out.has("property") && out.get("property").isTextual)
          out.set[JsonNode]("property-labels", labelsOr(out.get("property").asText()))
        if (out.has("unit") && out.get("unit").isTextual && out.get("unit").asText() != "1") {
          val u = out.get("unit").asText()
          out.set[JsonNode]("unit-labels", labelsOr(u.substring(u.lastIndexOf('/') + 1)))
        }
        if (out.has("datatype") && out.has("datavalue") && out.get("datavalue").isTextual
          && (out.get("datatype").asText() == "wikibase-item"
            || out.get("datatype").asText() == "wikibase-property")) {
          val id = out.get("datavalue").asText()
          val dv = WikidataJson.mapper.createObjectNode()
          dv.put("id", id)
          dv.set[JsonNode]("labels", labelsOr(id))
          out.set[JsonNode]("datavalue", dv)
        }
        // the reference then rebuilds the dict recursing over every value —
        // including the freshly spliced ones (no-ops there)
        val fin = WikidataJson.mapper.createObjectNode()
        out.properties().iterator().asScala.foreach { e =>
          fin.set[JsonNode](e.getKey, walk(e.getValue))
        }
        fin
      case a: ArrayNode =>
        val out = WikidataJson.mapper.createArrayNode()
        a.elements().asScala.foreach(x2 => out.add(walk(x2)))
        out
      case other => other
    }
    walk(n)
  }

  /** The stage-6 gate (`WikidataLabels.is_in_wikipedia`, :326-340): any
    * sitelink key ending in "wiki" — sitelink-only, unlike F1.
    */
  def hasWikiSitelink(item: JsonNode): Boolean = {
    val sl = item.path("sitelinks")
    sl.isObject && sl.properties().iterator().asScala.exists(_.getKey.endsWith("wiki"))
  }

  /** CPython `json.dumps(x, separators=(',',':'))` — compact AND
    * ensure_ascii=True (the stage-6 default): every non-ASCII char escapes to
    * \uXXXX of its UTF-16 code unit (astral chars → surrogate-pair escapes,
    * exactly CPython's behavior). Numbers: ints verbatim, floats via the
    * CPython repr replica.
    */
  def dumpsCompactAscii(n: JsonNode): String = {
    val sb = new StringBuilder
    def esc(s: String): Unit = {
      sb.append('"')
      s.foreach {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
    def walk(x: JsonNode): Unit = x match {
      case o: ObjectNode =>
        sb.append('{')
        var first = true
        o.properties().iterator().asScala.foreach { e =>
          if (!first) sb.append(','); first = false
          esc(e.getKey); sb.append(':'); walk(e.getValue)
        }
        sb.append('}')
      case a: ArrayNode =>
        sb.append('[')
        var first = true
        a.elements().asScala.foreach { x2 =>
          if (!first) sb.append(','); first = false
          walk(x2)
        }
        sb.append(']')
      case t if t.isTextual => esc(t.asText())
      case b if b.isBoolean => sb.append(if (b.asBoolean()) "true" else "false")
      case v if v.isNull => sb.append("null")
      case i if i.isIntegralNumber => sb.append(i.asText())
      case d => sb.append(graft.textify.PyFloat.repr(d.asDouble()))
    }
    walk(n)
    sb.toString
  }

  final case class HfRow(id: String, labels: String, descriptions: String,
                         aliases: String, sitelinks: String, claims: String)

  /** One export row per entity passing the sitelink gate — clean_entity +
    * the run.py:29-34 per-column compact dumps.
    *
    * Dirty-row tolerance: an entity missing any of the five object fields is
    * DROPPED (the reference would KeyError on it; every other corpus path
    * here drops rather than crashes — and without this gate a MissingNode
    * would fall through dumpsCompactAscii's number case and export literal
    * garbage instead of JSON).
    */
  def row(item: JsonNode, labelOf: String => Option[JsonNode]): Option[HfRow] = {
    if (!hasWikiSitelink(item)) return None
    val fields = Seq("labels", "descriptions", "aliases", "sitelinks", "claims")
    if (!item.path("id").isTextual || fields.exists(f => !item.path(f).isObject)) return None
    val claims = addLabels(cleanClaims(item.path("claims")), labelOf)
    val sitelinks = removeKeys(item.path("sitelinks"), Set("badges"))
    Some(HfRow(
      item.path("id").asText(),
      dumpsCompactAscii(item.path("labels")),
      dumpsCompactAscii(item.path("descriptions")),
      dumpsCompactAscii(item.path("aliases")),
      dumpsCompactAscii(sitelinks),
      dumpsCompactAscii(claims)))
  }

  /** Distributed export over corpus payloads: harvest the clean_labels
    * dimension, gather-join each page's referenced ids, render rows, assign
    * sequential fixed-size splits. Output: (split, id, labels, descriptions,
    * aliases, sitelinks, claims).
    */
  def export(spark: SparkSession, payloads: Dataset[PagePayload],
             rowsPerSplit: Long = 1000000L): DataFrame = {
    // sequential fixed-size splits (the reference's FILE_SIZE discipline);
    // see scaladoc: hash splits are the 10^12-row swap-in. The rendered rows
    // are the kg10 oracle frame: the JSON rendering is the non-SQL kernel
    // (golden-pinned), the split window below is DuckDB-replayed.
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("id"))
    graft.operators.OracleFrames.materialize(renderRows(spark, payloads).toDF(), "kg10_rows")
      .withColumn("split",
        ((row_number().over(w) - 1) / lit(rowsPerSplit)).cast("int"))
      .select("split", "id", "labels", "descriptions", "aliases", "sitelinks", "claims")
  }

  /** The 10^12-row split mode: a hash of the id instead of the sequential
    * window. Same rendered rows and columns, but split assignment is a
    * narrow map — no global total order, which is the sequential mode's
    * single-partition bottleneck at scale (that mode is kept because it is
    * the reference's observable file discipline and the golden pins it).
    *
    * The hash is md5-derived (first 8 hex digits mod nSplits), not
    * xxhash64: md5 is engine-portable, so the split assignment replays
    * bit-for-bit anywhere — the kg12 DuckDB oracle recomputes it as
    * `CAST('0x'||substring(md5(id),1,8) AS BIGINT) % n` — and is stable
    * across Spark versions (xxhash64's seed/impl is Spark-internal). The
    * rendered rows are materialized as the kg12 oracle frame under
    * graft.Verify (the JSON rendering is the golden-pinned non-SQL kernel,
    * exactly as kg10 does for the sequential mode).
    */
  def exportHashSplits(spark: SparkSession, payloads: Dataset[PagePayload],
                       nSplits: Int): DataFrame =
    graft.operators.OracleFrames.materialize(renderRows(spark, payloads).toDF(), "kg12_rows")
      .withColumn("split",
        pmod(conv(substring(md5(col("id")), 1, 8), 16, 10).cast("long"),
          lit(nSplits.toLong)).cast("int"))
      .select("split", "id", "labels", "descriptions", "aliases", "sitelinks", "claims")

  /** clean_entity + labels-splice + compact-json render over the corpus —
    * shared by both split modes.
    */
  private def renderRows(spark: SparkSession,
                         payloads: Dataset[PagePayload]): Dataset[HfRow] = {
    import spark.implicits._

    // pass 1 (labels DB analog): id → clean_labels(labels) as a JSON string
    val labelsDb = payloads.flatMap { pp =>
      WikidataJson.parseLine(pp.payload).flatMap { item =>
        val id = item.path("id").asText("")
        if (id.isEmpty) None
        else Some((id, dumpsCompactAscii(cleanLabels(item.path("labels")))))
      }
    }.toDF("lid", "llabels")

    // pass 2: per page, the ids its cleaned claims reference
    val refs = payloads.flatMap { pp =>
      WikidataJson.parseLine(pp.payload).toSeq.flatMap { item =>
        if (!hasWikiSitelink(item)) Seq.empty
        else gatherLabelIds(cleanClaims(item.path("claims"))).toSeq.map(r => (pp.url, r))
      }
    }.toDF("url", "ref")

    val labelMaps = refs
      .join(labelsDb, col("ref") === col("lid"), "inner")
      .groupBy("url")
      .agg(map_from_entries(collect_list(struct(col("ref"), col("llabels")))).as("lmap"))
      .as[(String, Map[String, String])]

    payloads
      .joinWith(labelMaps, payloads("url") === labelMaps("url"), "left")
      .flatMap { case (pp, resolved) =>
        val lmap = Option(resolved).map(_._2).getOrElse(Map.empty[String, String])
        WikidataJson.parseLine(pp.payload).flatMap { item =>
          row(item, id => lmap.get(id).map(WikidataJson.mapper.readTree))
        }
      }
  }
}
