package graft.text

/** Deterministic text extraction cleanup — the byte-identical-per-url
  * invariant surface (SURVEY.md S5; reference poligrapher/document.py:404-427).
  *
  * Pure function, codegen-friendly when wrapped in a UDF; golden-tested in
  * TextCleanSpec. Order of operations matters and is part of the invariant:
  * transliterate → fixups (email, wifi, geolocation, ID, plural-(s)).
  */
object TextClean {

  /** Characters whose presence marks a text as non-English
    * (reference NON_ENGLISH_RE, document.py:24-27): CJK, Hangul, kana,
    * Armenian, Arabic, Cyrillic, Greek, and Latin-Extended letters except
    * e-acute / multiply / divide. */
  private val nonEnglishLatin: Set[Char] =
    (0x00c0 until 0x0250).map(_.toChar).toSet -- Set('é', '×', '÷')

  def looksNonEnglish(text: String): Boolean = text.exists { c =>
    val b = Character.UnicodeBlock.of(c)
    nonEnglishLatin.contains(c) ||
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
    b == Character.UnicodeBlock.HANGUL_SYLLABLES ||
    b == Character.UnicodeBlock.HANGUL_JAMO ||
    b == Character.UnicodeBlock.HIRAGANA ||
    b == Character.UnicodeBlock.KATAKANA ||
    b == Character.UnicodeBlock.ARMENIAN ||
    b == Character.UnicodeBlock.ARABIC ||
    b == Character.UnicodeBlock.CYRILLIC ||
    b == Character.UnicodeBlock.GREEK
  }

  /** ASCII transliteration of the Latin-1 / punctuation range (the subset a
    * policy crawl actually contains; table-driven, no external lib). */
  def asciiFold(text: String): String = {
    val sb = new StringBuilder(text.length)
    text.foreach {
      case c if c < 0x80 => sb.append(c)
      case 'é' | 'è' | 'ê' | 'ë' => sb.append('e')
      case 'É' | 'È' | 'Ê' | 'Ë' => sb.append('E')
      case 'à' | 'á' | 'â' | 'ã' | 'ä' | 'å' => sb.append('a')
      case 'ç' => sb.append('c')
      case 'ñ' => sb.append('n')
      case 'ö' | 'ô' | 'ò' | 'ó' => sb.append('o')
      case 'ü' | 'û' | 'ù' | 'ú' => sb.append('u')
      case 'í' | 'î' | 'ï' | 'ì' => sb.append('i')
      case '‘' | '’' => sb.append('\'')
      case '“' | '”' => sb.append('"')
      case '–' | '—' => sb.append('-')
      case '…' => sb.append("...")
      case ' ' => sb.append(' ')
      case '®' => sb.append("(r)")
      case '©' => sb.append("(c)")
      case '™' => sb.append("(tm)")
      case '·' | '•' => sb.append('*')
      case _ => // drop anything else non-ASCII
    }
    sb.toString
  }

  private val emailRe = "(?i)\\be-mails?\\b".r
  private val wifiRe = "(?i)\\bwi-fi\\b".r
  private val geoRe = "(?i)\\bgeo-location\\b".r
  private val idRe = "\\bid\\b".r // case-sensitive on purpose
  private val pluralS = "\\b(\\w+)\\(s\\)".r

  /** The five tokenizer-workaround fixups (document.py:420-425). Each regex
    * is gated by a cheap substring probe — replaceAllIn allocates a Matcher
    * and rebuilds the string even on zero matches, and most segments match
    * none of the five. */
  def fixups(text: String): String = {
    var t = text
    val lower = t.toLowerCase
    if (lower.contains("e-mail")) t = emailRe.replaceAllIn(t, "email")
    if (lower.contains("wi-fi")) t = wifiRe.replaceAllIn(t, "WiFi")
    if (lower.contains("geo-location")) t = geoRe.replaceAllIn(t, "geolocation")
    if (t.contains("id")) t = idRe.replaceAllIn(t, "ID")
    if (t.contains("(s)")) t = pluralS.replaceAllIn(t, "$1s")
    t
  }

  /** Full per-segment cleanup: returns "" when non-English (the reference's
    * langdetect gate collapses to the char-class fallback here; the page-level
    * `lang` column is the primary gate at scale). */
  def clean(raw: String): String = {
    val joined = collapseWhitespace(raw)
    if (joined.isEmpty || looksNonEnglish(joined)) ""
    else fixups(asciiFold(joined))
  }

  /** Single-pass equivalent of split("\\s+").filter(_.nonEmpty).mkString(" ")
    * — the regex split allocated an array + a String per word per segment. */
  private def collapseWhitespace(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var pendingSpace = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
