package graft.textify

import java.time.LocalDate

/** Wikidata time → text, byte-identical to the reference
  * (ref: src/wikidataEmbed.py:173-267 `time_to_text`).
  *
  * Year arithmetic is `Long` (±1e16 years, far outside java.time — only the
  * Julian branch, guarded to 4-digit years, touches LocalDate). LocalDate is
  * proleptic Gregorian exactly like CPython's `datetime.date`, and the
  * Julian→Gregorian shift is the fixed 10-day 1582 gap the reference
  * computes via ordinals.
  *
  * Throws on malformed input / unknown precision / invalid Julian dates —
  * the caller falls back to the raw time string, mirroring the reference's
  * try/except in `mainsnak_to_value` (src/wikidataEmbed.py:130-135).
  */
object TimeText {

  // re.match prefix semantics: anchored at start, trailing text ignored
  private val TimeRe = "^([+-])(\\d{1,16})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):(\\d{2})Z".r

  def toText(timeValue: String, precision: Int, calendarmodel: String, lang: LangVariant): String = {
    val m = TimeRe.findFirstMatchIn(timeValue)
      .getOrElse(throw new IllegalArgumentException("Malformed time string"))
    val sign = m.group(1)
    val yearStr = m.group(2)
    val monthStr0 = m.group(3)
    val dayStr0 = m.group(4)
    val hourStr = m.group(5)
    val minuteStr = m.group(6)
    val secondStr = m.group(7)

    var year: Long = yearStr.toLong * (if (sign == "+") 1 else -1)
    var month: Int = 0
    var day: Int = 0

    // Julian → Gregorian when calendarmodel Q1985786, 1 < year ≤ 4 digits
    if (calendarmodel != null && calendarmodel.contains("Q1985786") &&
        year > 1 && math.abs(year).toString.length <= 4) {
      val m0 = if (monthStr0 == "00") 1 else monthStr0.toInt
      val d0 = if (dayStr0 == "00") 1 else dayStr0.toInt
      val greg =
        try LocalDate.of(year.toInt, m0, d0).plusDays(10)
        catch {
          case _: java.time.DateTimeException =>
            throw new IllegalArgumentException("Invalid date for Julian calendar")
        }
      // CPython date.fromordinal is bounded at year 9999
      if (greg.getYear > 9999)
        throw new IllegalArgumentException("Invalid date for Julian calendar")
      year = greg.getYear.toLong; month = greg.getMonthValue; day = greg.getDayOfMonth
    } else {
      month = if (monthStr0 == "00") 1 else monthStr0.toInt
      day = if (dayStr0 == "00") 1 else dayStr0.toInt
    }

    // months(month-1): out-of-range month throws, like Python's IndexError,
    // and the caller falls back to the raw time string
    val monthName = if (month != 0) lang.months(month - 1) else ""
    val ad = lang.ad
    val bc = lang.bc

    precision match {
      case 14 => s"$year $monthName $day $hourStr:$minuteStr:$secondStr"
      case 13 => s"$year $monthName $day $hourStr:$minuteStr"
      case 12 => s"$year $monthName $day $hourStr:00"
      case 11 => s"$day $monthName $year"
      case 10 => s"$monthName $year"
      case 9 =>
        val era = if (year > 0) "" else s" $bc"
        s"${math.abs(year)}$era"
      case 8 =>
        val decade = Math.floorDiv(year, 10L) * 10L // Python floor division
        val era = if (year > 0) ad else bc
        s"${math.abs(decade)}${lang.decade} $era"
      case 7 =>
        val c = Math.floorDiv(math.abs(year) - 1, 100L) + 1
        s"$c${lang.century} ${if (year > 0) ad else bc}"
      case 6 =>
        val mm = Math.floorDiv(math.abs(year) - 1, 1000L) + 1
        s"$mm${lang.millennium} ${if (year > 0) ad else bc}"
      case 5 => s"${math.abs(year) / 10000L} ${lang.tenThousandYears} ${if (year > 0) ad else bc}"
      case 4 => s"${math.abs(year) / 100000L} ${lang.hundredThousandYears} ${if (year > 0) ad else bc}"
      case 3 => s"${math.abs(year) / 1000000L} ${lang.millionYears} ${if (year > 0) ad else bc}"
      case 2 => s"${math.abs(year) / 10000000L} ${lang.tensOfMillionsYears} ${if (year > 0) ad else bc}"
      case 1 => s"${math.abs(year) / 100000000L} ${lang.hundredMillionYears} ${if (year > 0) ad else bc}"
      case 0 => s"${math.abs(year) / 1000000000L} ${lang.billionYears} ${if (year > 0) ad else bc}"
      case other => throw new IllegalArgumentException(s"Unknown precision value $other")
    }
  }
}
