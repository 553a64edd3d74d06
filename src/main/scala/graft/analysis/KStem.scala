package graft.analysis

/**
 * The Krovetz stemmer (the reference's en/KStemmer.java — R. Krovetz,
 * "Viewing Morphology as an Inference Process", SIGIR'93): a
 * dictionary-validated morphological normalizer. Unlike Porter it only
 * rewrites a word when the candidate root is an actual lexicon entry, so
 * "memorial" stays "memorial" while "memorials" becomes "memorial".
 *
 * The lexicon (~28k entries: the exception list, direct conflations,
 * country/nationality map, the main word list, supplements, and proper
 * nouns) is data extracted from the reference into
 * resources/graft/kstem_dict.tsv. The ending routines are a faithful
 * port of the reference's mutable (word, j, k) state machine — including
 * its deliberate quirks (the "restore then nolookup" paths and the
 * commented-ERROR extra lookup in alEndings). Validated word-for-word
 * against the reference's 12k-pair golden vocabulary (kstem.tsv).
 */
object KStem {
  private final val MaxWordLen = 50

  private final case class Entry(root: String, exception: Boolean)

  private lazy val dict: java.util.HashMap[String, Entry] = {
    val in = getClass.getResourceAsStream("/graft/kstem_dict.tsv")
    require(in != null, "missing kstem dictionary resource")
    val m = new java.util.HashMap[String, Entry](40000)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().foreach { line =>
      val f = line.split('\t')
      f(0) match {
        case "E" => m.put(f(1), Entry(f(1), exception = true))
        case "C" => m.put(f(1), Entry(f(2), exception = false))
        case "D" => m.put(f(1), Entry(null, exception = false))
        case _ =>
      }
    } finally src.close()
    m
  }

  /** Stem a lowercase term (unchanged when not stemmable / not changed). */
  def stem(term: String): String = {
    val s = session.get()
    if (s.run(term)) s.asString(term) else term
  }

  // run() fully resets the state, so one Stemmer per thread avoids a
  // buffer allocation per token on the index-build hot path (the
  // reference KStemFilter reuses its KStemmer the same way)
  private val session = new ThreadLocal[Stemmer] {
    override def initialValue(): Stemmer = new Stemmer
  }

  /** Per-call mutable state mirroring the reference's (word, j, k). */
  private final class Stemmer {
    private val word = new java.lang.StringBuilder(64)
    private var j = 0 // index of final letter in stem
    private var k = 0 // index of final letter in word
    private var matchedEntry: Entry = null
    private var result: String = null

    def asString(term: String): String =
      if (result != null) result else word.toString

    @inline private def wlen: Int = word.length
    @inline private def finalChar: Char = word.charAt(k)
    @inline private def penultChar: Char = word.charAt(k - 1)

    private def isCons(index: Int): Boolean = {
      val ch = word.charAt(index)
      if (ch == 'a' || ch == 'e' || ch == 'i' || ch == 'o' || ch == 'u') false
      else if (ch != 'y' || index == 0) true
      else !isCons(index - 1)
    }
    @inline private def isVowel(index: Int): Boolean = !isCons(index)
    @inline private def stemLength: Int = j + 1

    private def endsIn(s: String): Boolean = {
      if (s.length > k) return false
      val r = wlen - s.length
      j = k
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) != word.charAt(r + i)) return false
        i += 1
      }
      j = r - 1
      true
    }
    private def endsIn2(a: Char, b: Char): Boolean = {
      if (2 > k) return false
      if (word.charAt(k - 1) == a && word.charAt(k) == b) { j = k - 2; true }
      else false
    }
    private def endsIn3(a: Char, b: Char, c: Char): Boolean = {
      if (3 > k) return false
      if (word.charAt(k - 2) == a && word.charAt(k - 1) == b &&
        word.charAt(k) == c) { j = k - 3; true }
      else false
    }
    private def endsIn4(a: Char, b: Char, c: Char, d: Char): Boolean = {
      if (4 > k) return false
      if (word.charAt(k - 3) == a && word.charAt(k - 2) == b &&
        word.charAt(k - 1) == c && word.charAt(k) == d) { j = k - 4; true }
      else false
    }

    private def wordInDict(): Entry = {
      if (matchedEntry != null) return matchedEntry
      val e = dict.get(word.toString)
      if (e != null && !e.exception) matchedEntry = e
      e
    }
    private def lookup(): Boolean = {
      matchedEntry = dict.get(word.toString)
      matchedEntry != null
    }
    @inline private def matched: Boolean = matchedEntry != null

    private def setLen(n: Int): Unit = word.setLength(n)
    private def put(c: Char): Unit = word.append(c)
    private def app(s: String): Unit = word.append(s)

    private def setSuffix(s: String): Unit = {
      setLen(j + 1)
      app(s)
      k = j + s.length
    }

    private def doubleC(i: Int): Boolean =
      i >= 1 && word.charAt(i) == word.charAt(i - 1) && isCons(i)

    private def vowelInStem: Boolean =
      (0 until stemLength).exists(isVowel)

    private def plural(): Unit = {
      if (word.charAt(k) != 's') return
      if (endsIn3('i', 'e', 's')) {
        setLen(j + 3); k -= 1
        if (lookup()) return // calories -> calorie
        k += 1; put('s')
        setSuffix("y")
        lookup()
      } else if (endsIn2('e', 's')) {
        setLen(j + 2); k -= 1 // just drop the s (aides -> aide)
        val tryE = j > 0 && !(word.charAt(j) == 's' && word.charAt(j - 1) == 's')
        if (tryE && lookup()) return
        setLen(j + 1); k -= 1 // drop the es
        if (lookup()) return
        put('e'); k += 1 // default keeps the e
        if (!tryE) lookup()
      } else if (wlen > 3 && penultChar != 's' && !endsIn3('o', 'u', 's')) {
        setLen(k); k -= 1 // drop the final s
        lookup()
      }
    }

    private def pastTense(): Unit = {
      if (wlen <= 4) return // fled stays fled
      if (endsIn3('i', 'e', 'd')) {
        setLen(j + 3); k -= 1
        if (lookup()) return // died -> die
        k += 1; put('d')
        setSuffix("y")
        lookup()
        return
      }
      if (endsIn2('e', 'd') && vowelInStem) {
        setLen(j + 2); k = j + 1 // root ending in e?
        val entry = wordInDict()
        if (entry != null && !entry.exception) return
        setLen(j + 1); k = j // drop the ed
        if (lookup()) return
        if (doubleC(k)) { // backfilled -> backfill
          setLen(k); k -= 1
          if (lookup()) return
          put(word.charAt(k)); k += 1
          lookup()
          return
        }
        if (word.charAt(0) == 'u' && word.charAt(1) == 'n') {
          put('e'); put('d'); k += 2 // un- prefix: leave alone
          return
        }
        setLen(j + 1); put('e'); k = j + 1 // microcoded -> microcode
      }
    }

    private def aspect(): Unit = {
      if (wlen <= 5) return // aging handled by the dictionary
      if (endsIn3('i', 'n', 'g') && vowelInStem) {
        word.setCharAt(j + 1, 'e')
        setLen(j + 2); k = j + 1 // stem + e
        val entry = wordInDict()
        if (entry != null && !entry.exception) return
        setLen(k); k -= 1 // bare stem
        if (lookup()) return
        if (doubleC(k)) {
          k -= 1; setLen(k + 1)
          if (lookup()) return
          put(word.charAt(k)); k += 1 // fingerspelling -> fingerspell
          lookup()
          return
        }
        if (j > 0 && isCons(j) && isCons(j - 1)) {
          k = j; setLen(k + 1) // footstamping -> footstamp
          return
        }
        setLen(j + 1); put('e'); k = j + 1 // microcoding -> microcode
      }
    }

    private def ityEndings(): Unit = {
      val oldK = k
      if (endsIn3('i', 't', 'y')) {
        setLen(j + 1); k = j // drop -ity
        if (lookup()) return
        put('e'); k = j + 1 // -ity -> -e
        if (lookup()) return
        word.setCharAt(j + 1, 'i'); app("ty"); k = oldK
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'l') {
          setLen(j - 1); app("le"); k = j // -ability/-ibility -> -ble
          lookup()
          return
        }
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'v') {
          setLen(j + 1); put('e'); k = j + 1 // -ivity -> -ive
          lookup()
          return
        }
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'l') {
          setLen(j + 1); k = j // -ality -> -al
          lookup()
          return
        }
        if (lookup()) return // immunity -> immune, but not capacity -> capac
        setLen(j + 1); k = j // default removes -ity
      }
    }

    private def nceEndings(): Unit = {
      val oldK = k
      if (endsIn3('n', 'c', 'e')) {
        val wc = word.charAt(j)
        if (!(wc == 'e' || wc == 'a')) return
        setLen(j); put('e'); k = j // adherance -> adhere
        if (lookup()) return
        setLen(j); k = j - 1 // disappearance -> disappear
        if (lookup()) return
        put(wc); app("nce"); k = oldK // restore
      }
    }

    private def nessEndings(): Unit = {
      if (endsIn4('n', 'e', 's', 's')) {
        setLen(j + 1); k = j
        if (word.charAt(j) == 'i') word.setCharAt(j, 'y')
        lookup()
      }
    }

    private def ismEndings(): Unit = {
      if (endsIn3('i', 's', 'm')) {
        setLen(j + 1); k = j
        lookup()
      }
    }

    private def mentEndings(): Unit = {
      val oldK = k
      if (endsIn4('m', 'e', 'n', 't')) {
        setLen(j + 1); k = j
        if (lookup()) return
        app("ment"); k = oldK
      }
    }

    private def izeEndings(): Unit = {
      val oldK = k
      if (endsIn3('i', 'z', 'e')) {
        setLen(j + 1); k = j // drop -ize
        if (lookup()) return
        put('i')
        if (doubleC(j)) {
          setLen(j); k = j - 1
          if (lookup()) return
          put(word.charAt(j - 1))
        }
        setLen(j + 1); put('e'); k = j + 1 // -ize -> -e
        if (lookup()) return
        setLen(j + 1); app("ize"); k = oldK
      }
    }

    private def ncyEndings(): Unit = {
      if (endsIn3('n', 'c', 'y')) {
        if (!(word.charAt(j) == 'e' || word.charAt(j) == 'a')) return
        word.setCharAt(j + 2, 't') // -ncy -> -nt
        setLen(j + 3); k = j + 2
        if (lookup()) return
        word.setCharAt(j + 2, 'c'); put('e'); k = j + 3 // default -nce
        lookup()
      }
    }

    private def bleEndings(): Unit = {
      val oldK = k
      if (endsIn3('b', 'l', 'e')) {
        if (!(word.charAt(j) == 'a' || word.charAt(j) == 'i')) return
        val wc = word.charAt(j)
        setLen(j); k = j - 1 // drop -able/-ible
        if (lookup()) return
        if (doubleC(k)) {
          setLen(k); k -= 1
          if (lookup()) return
          k += 1; put(word.charAt(k - 1))
        }
        setLen(j); put('e'); k = j // -a/ible -> -e
        if (lookup()) return
        setLen(j); app("ate"); k = j + 2 // compensable -> compensate
        if (lookup()) return
        setLen(j); put(wc); app("ble"); k = oldK // restore
      }
    }

    private def icEndings(): Unit = {
      if (endsIn2('i', 'c')) {
        setLen(j + 3); app("al"); k = j + 4 // canonic -> canonical
        if (lookup()) return
        word.setCharAt(j + 1, 'y'); setLen(j + 2); k = j + 1 // -ic -> -y
        if (lookup()) return
        word.setCharAt(j + 1, 'e') // -ic -> -e
        if (lookup()) return
        setLen(j + 1); k = j // drop -ic
        if (lookup()) return
        app("ic"); k = j + 2 // restore
      }
    }

    private def ionEndings(): Unit = {
      val oldK = k
      if (!endsIn3('i', 'o', 'n')) return
      if (endsIn("ization")) { // -ization -> -ize
        setLen(j + 3); put('e'); k = j + 3
        lookup()
        return
      }
      if (endsIn("ition")) {
        setLen(j + 1); put('e'); k = j + 1 // definition -> define
        if (lookup()) return
        setLen(j + 1); app("ition"); k = oldK
      } else if (endsIn("ation")) {
        setLen(j + 3); put('e'); k = j + 3 // elimination -> eliminate
        if (lookup()) return
        setLen(j + 1); put('e'); k = j + 1 // -ation -> -e
        if (lookup()) return
        setLen(j + 1); k = j // resignation -> resign
        if (lookup()) return
        setLen(j + 1); app("ation"); k = oldK
      }
      if (endsIn("ication")) {
        setLen(j + 1); put('y'); k = j + 1 // amplification -> amplify
        if (lookup()) return
        setLen(j + 1); app("ication"); k = oldK
      }
      // plain -ion (j re-derived as in the reference's YCS restructuring)
      j = k - 3
      setLen(j + 1); put('e'); k = j + 1 // -ion -> -e
      if (lookup()) return
      setLen(j + 1); k = j // drop -ion
      if (lookup()) return
      setLen(j + 1); app("ion"); k = oldK // restore
    }

    private def erAndOrEndings(): Unit = {
      val oldK = k
      if (word.charAt(k) != 'r') return
      if (endsIn4('i', 'z', 'e', 'r')) { // -izer -> -ize
        setLen(j + 4); k = j + 3
        lookup()
        return
      }
      if (endsIn2('e', 'r') || endsIn2('o', 'r')) {
        val wc = word.charAt(j + 1)
        if (doubleC(j)) {
          setLen(j); k = j - 1
          if (lookup()) return
          put(word.charAt(j - 1)) // restore the doubled consonant
        }
        if (word.charAt(j) == 'i') { // -ier -> -y
          word.setCharAt(j, 'y'); setLen(j + 1); k = j
          if (lookup()) return
          word.setCharAt(j, 'i'); put('e') // restore
        }
        if (word.charAt(j) == 'e') { // -eer
          setLen(j); k = j - 1
          if (lookup()) return
          put('e')
        }
        setLen(j + 2); k = j + 1 // drop the -r
        if (lookup()) return
        setLen(j + 1); k = j // drop -er/-or
        if (lookup()) return
        put('e'); k = j + 1 // -or -> -e
        if (lookup()) return
        setLen(j + 1); put(wc); put('r'); k = oldK // restore
      }
    }

    private def lyEndings(): Unit = {
      val oldK = k
      if (endsIn2('l', 'y')) {
        word.setCharAt(j + 2, 'e') // -ly -> -le
        if (lookup()) return
        word.setCharAt(j + 2, 'y')
        setLen(j + 1); k = j // drop -ly
        if (lookup()) return
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'l')
          return // -ally -> -al
        app("ly"); k = oldK
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 'b') {
          word.setCharAt(j + 2, 'e'); k = j + 2 // -ably -> -able
          return
        }
        if (word.charAt(j) == 'i') { // militarily -> military
          setLen(j); put('y'); k = j
          if (lookup()) return
          setLen(j); app("ily"); k = oldK
        }
        setLen(j + 1); k = j // default drops -ly
      }
    }

    private def alEndings(): Unit = {
      val oldK = k
      if (wlen < 4) return
      if (endsIn2('a', 'l')) {
        setLen(j + 1); k = j // drop -al
        if (lookup()) return
        if (doubleC(j)) {
          setLen(j); k = j - 1
          if (lookup()) return
          put(word.charAt(j - 1))
        }
        setLen(j + 1); put('e'); k = j + 1 // -al -> -e
        if (lookup()) return
        setLen(j + 1); app("um"); k = j + 2 // optimal -> optimum
        if (lookup()) return
        setLen(j + 1); app("al"); k = oldK // restore
        if (j > 0 && word.charAt(j - 1) == 'i' && word.charAt(j) == 'c') {
          setLen(j - 1); k = j - 2 // drop -ical
          if (lookup()) return
          setLen(j - 1); put('y'); k = j - 1 // bibliographical -> bibliography
          if (lookup()) return
          setLen(j - 1); app("ic"); k = j // default -ical -> -ic
          lookup() // the reference's extra (commented-ERROR) lookup
          return
        }
        if (word.charAt(j) == 'i') { // -ial removal
          setLen(j); k = j - 1
          if (lookup()) return
          app("ial"); k = oldK
          lookup()
        }
      }
    }

    private def iveEndings(): Unit = {
      val oldK = k
      if (endsIn3('i', 'v', 'e')) {
        setLen(j + 1); k = j // drop -ive
        if (lookup()) return
        put('e'); k = j + 1 // -ive -> -e
        if (lookup()) return
        setLen(j + 1); app("ive")
        if (j > 0 && word.charAt(j - 1) == 'a' && word.charAt(j) == 't') {
          word.setCharAt(j - 1, 'e'); setLen(j); k = j - 1 // determinative -> determine
          if (lookup()) return
          setLen(j - 1) // drop -ative
          if (lookup()) return
          app("ative"); k = oldK
        }
        word.setCharAt(j + 2, 'o'); word.setCharAt(j + 3, 'n') // -ive -> -ion
        if (lookup()) return
        word.setCharAt(j + 2, 'v'); word.setCharAt(j + 3, 'e'); k = oldK
      }
    }

    /** Returns true when the result differs from the input contract-wise
      * (the reference returns true whenever stemming RAN — the caller
      * compares strings). */
    def run(term: String): Boolean = {
      result = null
      k = term.length - 1
      if (k <= 1 || k >= MaxWordLen - 1) return false
      val direct = dict.get(term)
      if (direct != null) {
        if (direct.root != null) { result = direct.root; return true }
        return false
      }
      word.setLength(0)
      var i = 0
      while (i < term.length) {
        val ch = term.charAt(i)
        if (ch < 'a' || ch > 'z') return false // lowercase alpha only
        word.append(ch)
        i += 1
      }
      matchedEntry = null

      var done = false
      def step(f: () => Unit): Unit = if (!done) { f(); if (matched) done = true }
      step(() => plural())
      step(() => pastTense())
      step(() => aspect())
      step(() => ityEndings())
      step(() => nessEndings())
      step(() => ionEndings())
      step(() => erAndOrEndings())
      step(() => lyEndings())
      step(() => alEndings())
      if (!done) wordInDict()
      step(() => iveEndings())
      step(() => izeEndings())
      step(() => mentEndings())
      step(() => bleEndings())
      step(() => ismEndings())
      step(() => icEndings())
      step(() => ncyEndings())
      if (!done) nceEndings()

      val entry = matchedEntry
      if (entry != null) result = entry.root // null root: word IS the stem
      true
    }
  }
}
