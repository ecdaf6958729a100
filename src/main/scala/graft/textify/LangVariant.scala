package graft.textify

/** One rendered claim value + its qualifiers, in render-ready label space. */
final case class RenderedClaim(value: String, qualifiers: Seq[(String, Seq[String])])

/** Language template pack — semantics of the reference's
  * `src/language_variables/{en,de,ar,rdf,json}.py`. Each variant defines the
  * byte-exact serialization of an entity (label, description, aliases,
  * claims) into its textified form.
  */
trait LangVariant extends Serializable {
  type Props = Seq[(String, Seq[RenderedClaim])]

  def name: String
  def novalue: String
  def months: IndexedSeq[String]
  def century: String
  def millennium: String
  def decade: String
  def ad: String
  def bc: String
  def tenThousandYears: String
  def hundredThousandYears: String
  def millionYears: String
  def tensOfMillionsYears: String
  def hundredMillionYears: String
  def billionYears: String

  def mergeEntityText(label: String, description: String, aliases: Seq[String], properties: Props): String

  /** Qualifier rendering `"{plabel}: v, v ; {plabel}: v"` shared by all
    * variants (ref: en.py:49-66, rdf.py:47-64). */
  protected def listJoin: String = ", "
  def qualifiersToText(qualifiers: Seq[(String, Seq[String])]): String =
    qualifiers.map { case (pl, vs) => s"$pl: ${vs.mkString(listJoin)}" }.mkString(" ; ")
}

/** The natural-language shape shared by en/de/ar (ref: en.py:23-97,
  * de.py:23-97, ar.py:23-97): differs only in connector strings and quote
  * glyphs.
  */
abstract class ProseVariant extends LangVariant {
  protected def labelDescSep: String
  protected def aliasIntro: String
  protected def attributesIntro: String
  protected def openQuote: String
  protected def closeQuote: String
  protected def claimSep: String

  def propertiesToText(properties: Props): String = {
    val sb = new StringBuilder
    properties.foreach { case (propertyLabel, claimValues) =>
      if (claimValues.nonEmpty) {
        val claims = new StringBuilder
        claimValues.foreach { cv =>
          if (claims.nonEmpty) claims.append(claimSep)
          claims.append(openQuote).append(cv.value)
          if (cv.qualifiers.nonEmpty)
            claims.append(" (").append(qualifiersToText(cv.qualifiers)).append(")")
          claims.append(closeQuote)
        }
        sb.append(s"\n- $propertyLabel: $claims")
      }
    }
    sb.toString
  }

  override def mergeEntityText(label: String, description: String, aliases: Seq[String], properties: Props): String = {
    var text = s"$label$labelDescSep$description"
    if (aliases.nonEmpty) text += s"$aliasIntro${aliases.mkString(listJoin)}"
    if (properties.nonEmpty) s"$text$attributesIntro${propertiesToText(properties)}"
    else s"$text."
  }
}

/** English (ref: src/language_variables/en.py). */
object LangEn extends ProseVariant {
  val name = "en"
  val novalue = "no value"
  val months = IndexedSeq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  val century = "th century"; val millennium = "th millennium"; val decade = "s"
  val ad = "AD"; val bc = "BC"
  val tenThousandYears = "ten thousand years"; val hundredThousandYears = "hundred thousand years"
  val millionYears = "million years"; val tensOfMillionsYears = "tens of millions of years"
  val hundredMillionYears = "hundred million years"; val billionYears = "billion years"
  protected val labelDescSep = ", "
  protected val aliasIntro = ", also known as "
  protected val attributesIntro = ". Attributes include: "
  protected val openQuote = "\""; protected val closeQuote = "\""
  protected val claimSep = ",\n "
}

/** German (ref: src/language_variables/de.py). */
object LangDe extends ProseVariant {
  val name = "de"
  val novalue = "kein Wert"
  val months = IndexedSeq("Jan", "Feb", "Mär", "Apr", "Mai", "Jun", "Jul", "Aug", "Sep", "Okt", "Nov", "Dez")
  val century = ". Jahrhundert"; val millennium = ". Jahrtausend"; val decade = "er Jahre"
  val ad = "n. Chr."; val bc = "v. Chr."
  val tenThousandYears = "Zehntausend Jahre"; val hundredThousandYears = "Hunderttausend Jahre"
  val millionYears = "Millionen Jahre"; val tensOfMillionsYears = "Zehn Millionen Jahre"
  val hundredMillionYears = "Hundert Millionen Jahre"; val billionYears = "Milliarden Jahre"
  protected val labelDescSep = ", "
  protected val aliasIntro = ", auch bekannt als "
  protected val attributesIntro = ". Attribute umfassen: "
  protected val openQuote = "„"; protected val closeQuote = "“" // „ … “
  protected val claimSep = ",\n "
}

/** Arabic (ref: src/language_variables/ar.py) — Arabic comma '،' joiners. */
object LangAr extends ProseVariant {
  val name = "ar"
  val novalue = "لا قيمة"
  val months = IndexedSeq(
    "كانون الثاني", "شباط", "آذار", "نيسان", "أيار", "حزيران",
    "تموز", "آب", "أيلول", "تشرين الأول", "تشرين الثاني", "كانون الأول")
  val century = "قرن"; val millennium = "ألفية"; val decade = "عقد"
  val ad = "م"; val bc = "ق.م"
  val tenThousandYears = "عشرة آلاف سنة"; val hundredThousandYears = "مئات آلاف السنين"
  val millionYears = "ملايين السنين"; val tensOfMillionsYears = "عشرات الملايين من السنين"
  val hundredMillionYears = "مئات الملايين من السنين"; val billionYears = "مليار سنة"
  override protected val listJoin = "، "
  protected val labelDescSep = "، "
  protected val aliasIntro = "، المعروف أيضًا باسم "
  protected val attributesIntro = ". السمات تتضمن: "
  protected val openQuote = "«"; protected val closeQuote = "»"
  protected val claimSep = "،\n "
}

/** Line-per-fact RDF-ish variant (ref: src/language_variables/rdf.py):
  * `"{label}: {plabel}: {value}"` per claim; claim groups without qualifiers
  * collapse to a comma list. Time strings use the en month/era tables.
  */
object LangRdf extends LangVariant {
  val name = "rdf"
  val novalue = LangEn.novalue
  val months = LangEn.months
  val century = LangEn.century; val millennium = LangEn.millennium; val decade = LangEn.decade
  val ad = LangEn.ad; val bc = LangEn.bc
  val tenThousandYears = LangEn.tenThousandYears; val hundredThousandYears = LangEn.hundredThousandYears
  val millionYears = LangEn.millionYears; val tensOfMillionsYears = LangEn.tensOfMillionsYears
  val hundredMillionYears = LangEn.hundredMillionYears; val billionYears = LangEn.billionYears

  def propertiesToText(properties: Props, label: String): String = {
    val sb = new StringBuilder
    properties.foreach { case (propertyLabel, claimValues) =>
      if (claimValues.nonEmpty) {
        val qualifierExists = claimValues.exists(_.qualifiers.nonEmpty)
        val claimsText =
          if (qualifierExists) {
            val cb = new StringBuilder
            claimValues.foreach { cv =>
              if (cb.nonEmpty) cb.append("\n")
              cb.append(s"$label: $propertyLabel: ${cv.value}")
              if (cv.qualifiers.nonEmpty)
                cb.append(" (").append(qualifiersToText(cv.qualifiers)).append(")")
            }
            cb.toString
          } else
            s"$label: $propertyLabel: ${claimValues.map(_.value).mkString(", ")}"
        sb.append("\n").append(claimsText)
      }
    }
    sb.toString
  }

  override def mergeEntityText(label: String, description: String, aliases: Seq[String], properties: Props): String = {
    var text = s"$label: Description: $description"
    if (aliases.nonEmpty) text += s"\n$label: Aliases: ${aliases.mkString(", ")}"
    if (properties.nonEmpty) text += propertiesToText(properties, label)
    text
  }
}

/** Compact-JSON variant (ref: src/language_variables/json.py:23-66):
  * `json.dumps({'label', 'description', 'aliases', **compressed_props},
  * ensure_ascii=False)` with single-element lists unwrapped and value-only
  * claims collapsed to scalars.
  */
object LangJsonVariant extends LangVariant {
  val name = "json"
  val novalue = LangEn.novalue
  val months = LangEn.months
  val century = LangEn.century; val millennium = LangEn.millennium; val decade = LangEn.decade
  val ad = LangEn.ad; val bc = LangEn.bc
  val tenThousandYears = LangEn.tenThousandYears; val hundredThousandYears = LangEn.hundredThousandYears
  val millionYears = LangEn.millionYears; val tensOfMillionsYears = LangEn.tensOfMillionsYears
  val hundredMillionYears = LangEn.hundredMillionYears; val billionYears = LangEn.billionYears

  private def compress(properties: Props): Seq[(String, PyJson)] =
    properties.map { case (key, items) =>
      val cleanedItems: Seq[PyJson] = items.map { item =>
        val obj = new PyObj
        obj.put("value", PyStr(item.value))
        item.qualifiers.foreach { case (k, vs) =>
          obj.put(k, if (vs.length == 1) PyStr(vs.head) else PyArr(vs.map(PyStr.apply)))
        }
        if (obj.size == 1) obj("value") else obj
      }
      key -> (if (cleanedItems.length == 1) cleanedItems.head else PyArr(cleanedItems))
    }

  override def mergeEntityText(label: String, description: String, aliases: Seq[String], properties: Props): String = {
    val root = new PyObj
    root.put("label", PyStr(label))
    root.put("description", PyStr(description))
    root.put("aliases", PyArr(aliases.map(PyStr.apply)))
    compress(properties).foreach { case (k, v) => root.put(k, v) }
    root.dumps
  }
}

object LangVariant {
  val all: Map[String, LangVariant] = Map(
    "en" -> LangEn, "de" -> LangDe, "ar" -> LangAr,
    "rdf" -> LangRdf, "json" -> LangJsonVariant)
  def apply(name: String): LangVariant =
    all.getOrElse(name, throw new IllegalArgumentException(s"Language file for '$name' not found."))

  /** Data language of a variant: the reference pipeline normalizes the whole
    * DB with LANGUAGE before textifying (src/wikidataDB.py:126-148 run per
    * LANG), so de/ar pick their own labels/descriptions/aliases (mul
    * fallback); rdf/json are en-data presentation variants.
    */
  def dataLang(name: String): String = name match {
    case "de" | "ar" => name
    case _ => "en"
  }
}
