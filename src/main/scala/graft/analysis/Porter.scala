package graft.analysis

/**
 * Porter stemming algorithm — the stemmer behind the reference's
 * PorterStemFilter (lucene/analysis/common/src/java/org/apache/lucene/
 * analysis/en/PorterStemFilter.java:30, which wraps PorterStemmer).
 *
 * Implemented directly from the published algorithm (M.F. Porter, "An
 * algorithm for suffix stripping", Program 14(3), 1980): steps 1a/1b/1c,
 * 2, 3, 4, 5a/5b over the measure m of the [C](VC)^m[V] decomposition,
 * with longest-suffix match inside each step. Verified against the golden
 * input/output pairs listed in the paper (AnalyzerSpec).
 *
 * Pure function, ASCII letters only are treated specially — terms with
 * non-[a-z] characters (digits, etc.) pass through unchanged, matching the
 * behavior of stemming an already-lowercased alphabetic token stream.
 */
object Porter extends Serializable {

  def stem(term: String): String = {
    // stemming applies to lowercase alphabetic words of length >= 3
    if (term.length < 3) return term
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c < 'a' || c > 'z') return term
      i += 1
    }
    val b = new StringBuilder(term)
    step1a(b); step1b(b); step1c(b); step2(b); step3(b); step4(b); step5(b)
    b.toString
  }

  // A letter is a consonant if it is not a vowel, and 'y' is a consonant
  // only when it starts the word or follows a vowel.
  private def isCons(b: StringBuilder, i: Int): Boolean = b.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(b, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in [C](VC)^m[V] over b[0, end). */
  private def measure(b: StringBuilder, end: Int): Int = {
    var i = 0
    // skip the optional initial consonant run
    while (i < end && isCons(b, i)) i += 1
    var m = 0
    while (i < end) {
      while (i < end && !isCons(b, i)) i += 1 // vowel run
      if (i < end) {
        m += 1
        while (i < end && isCons(b, i)) i += 1 // consonant run
      }
    }
    m
  }

  /** *v*: a vowel in b[0, end). */
  private def hasVowel(b: StringBuilder, end: Int): Boolean = {
    var i = 0
    while (i < end) { if (!isCons(b, i)) return true; i += 1 }
    false
  }

  /** *d: b[0, end) ends with a double consonant. */
  private def endsDoubleCons(b: StringBuilder, end: Int): Boolean =
    end >= 2 && b.charAt(end - 1) == b.charAt(end - 2) && isCons(b, end - 1)

  /** *o: b[0, end) ends cvc where the final c is not w, x or y. */
  private def endsCvc(b: StringBuilder, end: Int): Boolean = {
    if (end < 3) return false
    val c = b.charAt(end - 1)
    isCons(b, end - 1) && !isCons(b, end - 2) && isCons(b, end - 3) &&
      c != 'w' && c != 'x' && c != 'y'
  }

  private def endsWith(b: StringBuilder, s: String): Boolean = {
    val n = b.length - s.length
    if (n < 0) return false
    var i = 0
    while (i < s.length) { if (b.charAt(n + i) != s.charAt(i)) return false; i += 1 }
    true
  }

  /** Replace suffix `s` with `r` if m of the stem > `mGt`. Returns whether
    * the suffix matched (regardless of whether the condition held). */
  private def replaceIf(b: StringBuilder, s: String, r: String, mGt: Int): Boolean = {
    if (!endsWith(b, s)) return false
    val stemEnd = b.length - s.length
    if (measure(b, stemEnd) > mGt) { b.setLength(stemEnd); b.append(r) }
    true
  }

  private def step1a(b: StringBuilder): Unit = {
    if (endsWith(b, "sses")) b.setLength(b.length - 2)
    else if (endsWith(b, "ies")) b.setLength(b.length - 2)
    else if (endsWith(b, "ss")) ()
    else if (endsWith(b, "s")) b.setLength(b.length - 1)
  }

  private def step1b(b: StringBuilder): Unit = {
    if (endsWith(b, "eed")) {
      if (measure(b, b.length - 3) > 0) b.setLength(b.length - 1)
    } else {
      val dropped =
        if (endsWith(b, "ed") && hasVowel(b, b.length - 2)) { b.setLength(b.length - 2); true }
        else if (endsWith(b, "ing") && hasVowel(b, b.length - 3)) { b.setLength(b.length - 3); true }
        else false
      if (dropped) {
        if (endsWith(b, "at") || endsWith(b, "bl") || endsWith(b, "iz")) b.append('e')
        else if (endsDoubleCons(b, b.length) && {
          val c = b.charAt(b.length - 1); c != 'l' && c != 's' && c != 'z'
        }) b.setLength(b.length - 1)
        else if (measure(b, b.length) == 1 && endsCvc(b, b.length)) b.append('e')
      }
    }
  }

  private def step1c(b: StringBuilder): Unit =
    if (endsWith(b, "y") && hasVowel(b, b.length - 1))
      b.setCharAt(b.length - 1, 'i')

  private val Step2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val Step3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step2(b: StringBuilder): Unit = {
    val it = Step2.iterator
    var done = false
    while (!done && it.hasNext) {
      val (s, r) = it.next()
      done = replaceIf(b, s, r, 0)
    }
  }

  private def step3(b: StringBuilder): Unit = {
    val it = Step3.iterator
    var done = false
    while (!done && it.hasNext) {
      val (s, r) = it.next()
      done = replaceIf(b, s, r, 0)
    }
  }

  private val Step4: Seq[String] = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(b: StringBuilder): Unit = {
    // longest match first within the fixed list order of the paper; "ion"
    // additionally requires the stem to end in s or t
    val it = Step4.sortBy(-_.length).iterator
    var done = false
    while (!done && it.hasNext) {
      val s = it.next()
      if (endsWith(b, s)) {
        val stemEnd = b.length - s.length
        val ionOk = s != "ion" || (stemEnd > 0 && {
          val c = b.charAt(stemEnd - 1); c == 's' || c == 't'
        })
        if (ionOk) {
          if (measure(b, stemEnd) > 1) b.setLength(stemEnd)
          done = true
        }
      }
    }
  }

  private def step5(b: StringBuilder): Unit = {
    // 5a: drop trailing e when m > 1, or m == 1 and not *o
    if (endsWith(b, "e")) {
      val m = measure(b, b.length - 1)
      if (m > 1 || (m == 1 && !endsCvc(b, b.length - 1))) b.setLength(b.length - 1)
    }
    // 5b: m > 1 and *d and *L -> single letter
    if (b.length > 1 && b.charAt(b.length - 1) == 'l' &&
        endsDoubleCons(b, b.length) && measure(b, b.length) > 1)
      b.setLength(b.length - 1)
  }
}
