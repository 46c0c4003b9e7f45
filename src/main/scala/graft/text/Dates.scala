package graft.text

/** Shared calendar vocabulary for the HTTP/feed date parsers — ONE
  * copy of the month/weekday token tables and the 2-digit-year pivot
  * so [[Feeds.rfc822Day]] (RSS pubDate) and
  * [[graft.multimodal.Revisit.parseHttpDate]] (RFC 9110 §5.6.7)
  * cannot drift apart (review-r11 finding: three copies existed).
  */
object Dates {

  val months: Seq[String] = Seq("Jan", "Feb", "Mar", "Apr", "May",
    "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  val weekdaysShort: Set[String] = Set("Mon", "Tue", "Wed", "Thu",
    "Fri", "Sat", "Sun")

  val weekdaysLong: Set[String] = Set("Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday", "Sunday")

  /** The POSIX two-digit-year pivot both RFC 850 and RFC 822 dates
    * use: 00–69 → 20xx, 70–99 → 19xx.
    */
  def pivotYear(y2: Int): Int = if (y2 <= 69) 2000 + y2 else 1900 + y2
}
