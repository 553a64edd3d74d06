package graft.analysis

/**
 * Snowball stemmers for German, Spanish, and French, implemented from the
 * published algorithm descriptions (M.F. Porter, snowballstem.org; the
 * algorithms are public and the reference wires their generated forms via
 * lucene/analysis/common/src/java/org/apache/lucene/analysis/snowball/
 * SnowballFilter.java:31). Re-derived from the prose specifications —
 * validated word-for-word against the published test vocabularies in
 * src/test/resources/snowball (SnowballVocabSpec).
 *
 * Shared machinery: the standard R1/R2 regions (R1 = region after the
 * first non-vowel following a vowel; R2 = the same definition applied
 * within R1) and language-specific RV regions, all tracked as indices
 * into a mutable StringBuilder.
 */
object Snowball {

  /** First index of the region after the first non-vowel following a
    * vowel, searching from `from`; length if not found. */
  private def regionAfterVC(s: CharSequence, from: Int, isVowel: Char => Boolean): Int = {
    var i = from
    val n = s.length
    while (i < n && !isVowel(s.charAt(i))) i += 1    // find a vowel
    while (i < n && isVowel(s.charAt(i))) i += 1     // then a non-vowel
    if (i < n) i + 1 else n
  }

  // ---------------------------------------------------------------- German

  /** Snowball German stemming algorithm (the classic 'german' variant the
    * reference's GermanStemmer implements). */
  object German {
    private def isVowel(c: Char): Boolean = "aeiouyäöü".indexOf(c) >= 0
    private val SEnding = "bdfghklmnrt"
    private val StEnding = "bdfghklmnt"

    def stem(word0: String): String = {
      if (word0.isEmpty) return word0
      val sb = new StringBuilder(word0.length + 4)
      // substitute ß, and mark u/y between vowels as consonants (upper case)
      var i = 0
      while (i < word0.length) {
        val c = word0.charAt(i)
        if (c == 'ß') sb.append("ss") else sb.append(c)
        i += 1
      }
      i = 1
      while (i < sb.length - 1) {
        val c = sb.charAt(i)
        if ((c == 'u' || c == 'y') && isVowel(sb.charAt(i - 1)) && isVowel(sb.charAt(i + 1)))
          sb.setCharAt(i, c.toUpper)
        i += 1
      }

      var r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)
      // R1 is adjusted so that the region before it has at least 3 letters
      if (r1 < 3) r1 = 3
      if (r1 > sb.length) r1 = sb.length

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inR1(suf: String): Boolean = sb.length - suf.length >= r1
      def inR2(suf: String): Boolean = sb.length - suf.length >= r2
      def del(n: Int): Unit = sb.setLength(sb.length - n)

      // Step 1
      var done = false
      for (suf <- Seq("ern", "em", "er") if !done) {
        if (endsWith(suf)) { done = true; if (inR1(suf)) del(suf.length) }
      }
      if (!done) {
        for (suf <- Seq("en", "es", "e") if !done) {
          if (endsWith(suf)) {
            done = true
            if (inR1(suf)) del(suf.length)
          }
        }
      }
      if (!done && endsWith("s") && sb.length >= 2 &&
          SEnding.indexOf(sb.charAt(sb.length - 2)) >= 0) {
        done = true
        if (inR1("s")) del(1)
      }

      // Step 2
      done = false
      for (suf <- Seq("est", "en", "er") if !done) {
        if (endsWith(suf)) { done = true; if (inR1(suf)) del(suf.length) }
      }
      if (!done && endsWith("st") && sb.length >= 6 &&
          StEnding.indexOf(sb.charAt(sb.length - 3)) >= 0) {
        done = true
        if (inR1("st")) del(2)
      }

      // Step 3: d-suffixes
      if (endsWith("end") || endsWith("ung")) {
        if (inR2("end")) {
          del(3)
          if (endsWith("ig") && !endsWith("eig") && inR2("ig")) del(2)
        }
      } else if (endsWith("isch")) {
        if (inR2("isch") && !endsWith("eisch")) del(4)
      } else if (endsWith("ig") || endsWith("ik")) {
        val suf = sb.substring(sb.length - 2)
        if (inR2(suf) && !(sb.length >= 3 && sb.charAt(sb.length - 3) == 'e')) del(2)
      } else if (endsWith("lich") || endsWith("heit")) {
        if (inR2("lich")) {
          del(4)
          if ((endsWith("er") || endsWith("en")) && inR1("er")) del(2)
        }
      } else if (endsWith("keit")) {
        if (inR2("keit")) {
          del(4)
          if (endsWith("lich") && inR2("lich")) del(4)
          else if (endsWith("ig") && inR2("ig")) del(2)
        }
      }

      // Finally: unmark consonant u/y, remove umlauts
      i = 0
      while (i < sb.length) {
        sb.charAt(i) match {
          case 'U' => sb.setCharAt(i, 'u')
          case 'Y' => sb.setCharAt(i, 'y')
          case 'ä' => sb.setCharAt(i, 'a')
          case 'ö' => sb.setCharAt(i, 'o')
          case 'ü' => sb.setCharAt(i, 'u')
          case _ =>
        }
        i += 1
      }
      sb.toString
    }
  }

  // --------------------------------------------------------------- Spanish

  /** Snowball Spanish stemming algorithm. */
  object Spanish {
    private def isVowel(c: Char): Boolean = "aeiouáéíóúü".indexOf(c) >= 0

    /** Spanish/French-family RV: second-letter-consonant -> after the next
      * vowel; two leading vowels -> after the next consonant; else after
      * the third letter. */
    private def rvOf(s: CharSequence): Int = {
      val n = s.length
      if (n < 3) return n
      if (!isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && !isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else if (isVowel(s.charAt(0)) && isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else 3
    }

    private val Pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    private val Step0A = Seq("iéndo", "ándo", "ár", "ér", "ír")
    private val Step0B = Seq("iendo", "ando", "ar", "er", "ir")

    private val Step1Del = Seq("amientos", "imientos", "amiento", "imiento",
      "anzas", "icos", "icas", "ismos", "ables", "ibles", "istas", "osos",
      "osas", "anza", "ico", "ica", "ismo", "able", "ible", "ista", "oso",
      "osa")
    private val Step1Ador = Seq("aciones", "adoras", "adores", "ancias",
      "adora", "ación", "antes", "ancia", "ador", "ante")
    private val Step2aY = Seq("yeron", "yendo", "yamos", "yais", "yan",
      "yen", "yas", "yes", "ya", "ye", "yo", "yó")
    private val Step2bGu = Seq("emos", "éis", "en", "es")
    private val Step2b = Seq("aríamos", "eríamos", "iríamos", "iéramos",
      "iésemos", "aríais", "aremos", "eríais", "eremos", "iríais", "iremos",
      "ierais", "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
      "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
      "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
      "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás", "aría",
      "erán", "erás", "ería", "irán", "irás", "iría", "iera", "iese",
      "aste", "iste", "aban", "aran", "asen", "aron", "ando", "abas",
      "adas", "idas", "aras", "ases", "íais", "ados", "idos", "amos",
      "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada",
      "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad",
      "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís")

    def stem(word: String): String = {
      if (word.length < 2) return deAccent(word)
      val sb = new StringBuilder(word)
      val rv = rvOf(sb)
      val r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inRegion(suf: String, r: Int): Boolean = sb.length - suf.length >= r
      def del(n: Int): Unit = sb.setLength(sb.length - n)

      // Step 0: attached pronoun
      Pronouns.find(endsWith) match {
        case Some(p) =>
          val stemEnd = sb.length - p.length
          val head = sb.substring(0, stemEnd)
          def headEnds(s: String) = head.length >= s.length && head.endsWith(s)
          val a = Step0A.find(headEnds).filter(s => stemEnd - s.length >= rv)
          val b = Step0B.find(headEnds).filter(s => stemEnd - s.length >= rv)
          if (a.isDefined) {
            del(p.length)
            // remove the accent from the verb ending
            val i = sb.length - a.get.length
            var j = i
            while (j < sb.length) { sb.setCharAt(j, deAccentChar(sb.charAt(j))); j += 1 }
          } else if (b.isDefined) {
            del(p.length)
          } else if (headEnds("yendo") && head.length >= 6 &&
                     head.charAt(head.length - 6) == 'u') {
            del(p.length)
          }
        case None =>
      }

      // Step 1: standard suffix removal (longest match over the whole set)
      val len0 = sb.length
      val all1 = (Step1Del ++ Step1Ador ++ Seq("logías", "logía", "uciones",
        "ución", "encias", "encia", "amente", "mente", "idades", "idad",
        "ivas", "ivos", "iva", "ivo")).sortBy(-_.length)
      all1.find(endsWith) match {
        case Some(suf) if Step1Del.contains(suf) =>
          if (inRegion(suf, r2)) del(suf.length)
        case Some(suf) if Step1Ador.contains(suf) =>
          if (inRegion(suf, r2)) {
            del(suf.length)
            if (endsWith("ic") && inRegion("ic", r2)) del(2)
          }
        case Some(suf @ ("logías" | "logía")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("log") }
        case Some(suf @ ("uciones" | "ución")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("u") }
        case Some(suf @ ("encias" | "encia")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("ente") }
        case Some("amente") =>
          if (inRegion("amente", r1)) {
            del(6)
            if (endsWith("iv") && inRegion("iv", r2)) {
              del(2)
              if (endsWith("at") && inRegion("at", r2)) del(2)
            } else {
              Seq("os", "ic", "ad").find(p => sb.endsWith(p) && inRegion(p, r2))
                .foreach(_ => del(2))
            }
          }
        case Some("mente") =>
          if (inRegion("mente", r2)) {
            del(5)
            Seq("ante", "able", "ible").find(p => sb.endsWith(p) && inRegion(p, r2))
              .foreach(_ => del(4))
          }
        case Some(suf @ ("idades" | "idad")) =>
          if (inRegion(suf, r2)) {
            del(suf.length)
            Seq("abil", "ic", "iv").find(p => sb.endsWith(p) && inRegion(p, r2))
              .foreach(p => del(p.length))
          }
        case Some(suf @ ("ivas" | "ivos" | "iva" | "ivo")) =>
          if (inRegion(suf, r2)) {
            del(suf.length)
            if (endsWith("at") && inRegion("at", r2)) del(2)
          }
        case _ =>
      }

      // Steps 2a/2b are `setlimit tomark pV` in the published algorithm:
      // the suffix search itself is confined to RV, so a shorter suffix
      // inside RV matches even when a longer one starts before RV.
      var removed2a = false
      if (sb.length == len0) {
        // Step 2a: -y- verb suffixes after u (the u need not be in RV)
        Step2aY.sortBy(-_.length)
          .find(s => endsWith(s) && inRegion(s, rv)) match {
          case Some(suf) if sb.length - suf.length >= 1 &&
              sb.charAt(sb.length - suf.length - 1) == 'u' =>
            del(suf.length); removed2a = true
          case _ =>
        }
        // Step 2b (only if 2a removed nothing)
        if (!removed2a) {
          (Step2bGu ++ Step2b).sortBy(-_.length)
            .find(s => endsWith(s) && inRegion(s, rv)) match {
            case Some(suf) if Step2bGu.contains(suf) =>
              del(suf.length)
              if (endsWith("gu")) del(1)
            case Some(suf) =>
              del(suf.length)
            case None =>
          }
        }
      }

      // Step 3: residual suffix (one longest match among the whole set)
      Seq("os", "a", "o", "á", "í", "ó", "e", "é").find(endsWith) match {
        case Some(suf @ ("e" | "é")) =>
          if (inRegion(suf, rv)) {
            del(1)
            if (endsWith("gu") && sb.length - 1 >= rv) del(1)
          }
        case Some(suf) =>
          if (inRegion(suf, rv)) del(suf.length)
        case None =>
      }

      var i = 0
      while (i < sb.length) { sb.setCharAt(i, deAccentChar(sb.charAt(i))); i += 1 }
      sb.toString
    }

    private def deAccentChar(c: Char): Char = c match {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'
      case other => other
    }
    private def deAccent(s: String): String = s.map(deAccentChar)
  }

  // ------------------------------------------------------------- Hungarian

  /** Snowball Hungarian stemming algorithm (the published algorithm's
    * original encoding spells ő/ű as õ/û, as does the test vocabulary).
    * R1 starts after the first consonant-or-digraph following a leading
    * vowel run, or after the first vowel of a consonant-initial word.
    * Every step is a match-then-R1 among; doubled-consonant endings
    * (including digraph doubles like ggy/ssz) undouble by dropping the
    * second-to-last character. */
  object Hungarian {
    private val Vowels = "aáeéiíoóöõuúüû"
    private def isVowel(c: Char): Boolean = Vowels.indexOf(c) >= 0
    private val Digraphs = Seq("dzs", "ccs", "zzs", "ssz", "ggy", "lly",
      "nny", "tty", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
    private val StartDigraphs = Seq("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
    private val Doubles = Seq("ccs", "ggy", "lly", "nny", "ssz", "tty",
      "zzs", "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
      "pp", "rr", "ss", "tt", "vv", "zz")
    private val CaseSuffixes = Seq("képpen", "anként", "enként", "onként",
      "ként", "képp", "ban", "ben", "nak", "nek", "val", "vel", "nál",
      "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl", "hez", "hoz",
      "höz", "ért", "kor", "ba", "ra", "be", "re", "ig", "ul", "ül",
      "an", "en", "on", "ön", "at", "et", "ot", "öt", "vá", "vé", "n", "t")
      .sortBy(-_.length)
    // (suffix, replacement or null=delete)
    private val Owned = Seq("áéi" -> "a", "ééi" -> "e", "aké" -> null,
      "eké" -> null, "oké" -> null, "áké" -> "a", "éké" -> "e",
      "öké" -> null, "éi" -> null, "ké" -> null, "éé" -> "e", "é" -> null)
    private val SingOwner = Seq("ájuk" -> "a", "éjük" -> "e", "unk" -> null,
      "ánk" -> "a", "énk" -> "e", "ünk" -> null, "juk" -> null,
      "jük" -> null, "ja" -> null, "je" -> null, "ad" -> null,
      "ed" -> null, "od" -> null, "ád" -> "a", "éd" -> "e", "öd" -> null,
      "nk" -> null, "uk" -> null, "ük" -> null, "am" -> null,
      "em" -> null, "om" -> null, "ám" -> "a", "ém" -> "e", "a" -> null,
      "d" -> null, "e" -> null, "m" -> null, "o" -> null, "á" -> "a",
      "é" -> "e")
    private val PlurOwner = Seq("jeitek" -> null, "jaitok" -> null,
      "aitok" -> null, "áitok" -> "a", "eitek" -> null, "éitek" -> "e",
      "jaink" -> null, "jeink" -> null, "jaid" -> null, "jeid" -> null,
      "itek" -> null, "aink" -> null, "eink" -> null, "áink" -> "a",
      "éink" -> "e", "jaim" -> null, "jeim" -> null, "aid" -> null,
      "eid" -> null, "áid" -> "a", "éid" -> "e", "jai" -> null,
      "jei" -> null, "aik" -> null, "jaik" -> null, "jeik" -> null,
      "eik" -> null, "áik" -> "a", "éik" -> "e", "ink" -> null,
      "aim" -> null, "eim" -> null, "áim" -> "a", "éim" -> "e",
      "id" -> null, "ai" -> null, "ei" -> null, "ái" -> "a", "éi" -> "e",
      "ik" -> null, "im" -> null, "i" -> null)
    private val Plural = Seq("ák" -> "a", "ék" -> "e", "ök" -> null,
      "ak" -> null, "ok" -> null, "ek" -> null, "k" -> null)

    def stem(word0: String): String = {
      if (word0.length < 2) return word0
      val sb = new StringBuilder(word0)

      val r1: Int = {
        if (isVowel(sb.charAt(0))) {
          var i = 0
          while (i < sb.length && isVowel(sb.charAt(i))) i += 1
          if (i >= sb.length) sb.length
          else {
            val rest = sb.substring(i)
            StartDigraphs.find(rest.startsWith) match {
              case Some(d) => i + d.length
              case None => i + 1
            }
          }
        } else {
          var i = 0
          while (i < sb.length && !isVowel(sb.charAt(i))) i += 1
          if (i >= sb.length) sb.length else i + 1
        }
      }

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inR1(suf: String): Boolean = sb.length - suf.length >= r1
      def del(n: Int): Unit = sb.setLength(sb.length - n)
      def endsDouble: Boolean = Doubles.exists(endsWith)
      def undouble(): Unit =
        if (sb.length >= 2) sb.deleteCharAt(sb.length - 2): Unit
      def vEnding(): Unit = {
        if (endsWith("á") && inR1("á")) sb.setCharAt(sb.length - 1, 'a')
        else if (endsWith("é") && inR1("é")) sb.setCharAt(sb.length - 1, 'e')
      }
      def amongReplace(table: Seq[(String, String)]): Unit =
        table.sortBy(-_._1.length).find { case (s, _) => endsWith(s) } match {
          case Some((s, by)) if inR1(s) =>
            del(s.length)
            if (by != null) sb.append(by)
          case _ =>
        }

      // instrumental: al/el in R1 after a double consonant
      Seq("al", "el").find(endsWith) match {
        case Some(s) if inR1(s) && {
          val head = sb.substring(0, sb.length - 2)
          Doubles.exists(head.endsWith)
        } =>
          del(2); undouble()
        case _ =>
      }
      // general cases, then repair á/é endings
      CaseSuffixes.find(endsWith) match {
        case Some(s) if inR1(s) => del(s.length); vEnding()
        case _ =>
      }
      // special cases
      Seq("ánként", "én", "án").find(endsWith) match {
        case Some(s @ "ánként") if inR1(s) => del(6); sb.append("a")
        case Some(s @ "én") if inR1(s) => del(2); sb.append("e")
        case Some(s @ "án") if inR1(s) => del(2); sb.append("a")
        case _ =>
      }
      // other cases (stul/stül family)
      Seq("ástul", "éstül", "astul", "estül", "stul", "stül")
        .find(endsWith) match {
        case Some(s @ "ástul") if inR1(s) => del(5); sb.append("a")
        case Some(s @ "éstül") if inR1(s) => del(5); sb.append("e")
        case Some(s) if inR1(s) => del(s.length)
        case _ =>
      }
      // factive á/é after a double consonant
      Seq("á", "é").find(endsWith) match {
        case Some(s) if inR1(s) && {
          val head = sb.substring(0, sb.length - 1)
          Doubles.exists(head.endsWith)
        } =>
          del(1); undouble()
        case _ =>
      }
      amongReplace(Owned)
      amongReplace(SingOwner)
      amongReplace(PlurOwner)
      amongReplace(Plural)
      sb.toString
    }
  }

  // --------------------------------------------------------------- Finnish

  /** Snowball Finnish stemming algorithm. Semantics decoded from the
    * published description plus the generated automaton's behavioral
    * contract: suffix matching (and any among-attached VI/LONG lookback)
    * is confined to R1/R2, switch-level conditions test unlimited
    * lookbacks, and a failed among-attached condition falls back down the
    * suffix trie (den/seen/tten/siin fall back to the bare n case) while
    * a failed switch condition fails the whole step. */
  object Finnish {
    private def isVowel(c: Char): Boolean = "aeiouyäö".indexOf(c) >= 0
    private val LongPairs = Set("aa", "ee", "ii", "oo", "uu", "ää", "öö")
    private val ViVowels = "aeiouäö" // V2: vowels sans y, for the Vi test

    def stem(word0: String): String = {
      if (word0.length < 2) return word0
      val sb = new StringBuilder(word0)
      val r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inR1(suf: String): Boolean = sb.length - suf.length >= r1
      def inR2(suf: String): Boolean = sb.length - suf.length >= r2
      def del(n: Int): Unit = sb.setLength(sb.length - n)
      def at(back: Int): Char =
        if (sb.length >= back) sb.charAt(sb.length - back) else '\u0000'

      // Step 1: particles — suffix in R1; gates look back unlimited
      Seq("kaan", "kään", "sti", "han", "hän", "kin", "ko", "kö", "pa", "pä")
        .sortBy(-_.length).find(s => endsWith(s) && inR1(s)) match {
        case Some("sti") => if (inR2("sti")) del(3)
        case Some(s) =>
          val p = at(s.length + 1)
          if (p == 'n' || p == 't' || isVowel(p)) del(s.length)
        case None =>
      }

      // Step 2: possessives — suffix in R1; gates unlimited
      Seq("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
        .sortBy(-_.length).find(s => endsWith(s) && inR1(s)) match {
        case Some("si") => if (at(3) != 'k') del(2)
        case Some("ni") =>
          del(2)
          if (endsWith("kse")) { del(1); sb.append("i") }
        case Some(s @ ("nsa" | "nsä" | "mme" | "nne")) => del(3)
        case Some("an") =>
          if (Seq("ta", "ssa", "sta", "lla", "lta", "na")
                .exists(p => sb.substring(0, sb.length - 2).endsWith(p))) del(2)
        case Some("än") =>
          if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä")
                .exists(p => sb.substring(0, sb.length - 2).endsWith(p))) del(2)
        case Some("en") =>
          if (Seq("lle", "ine").exists(p => sb.substring(0, sb.length - 2).endsWith(p)))
            del(2)
        case _ =>
      }

      // Step 3: case endings
      var endingRemoved = false
      def caseEnding(): Unit = {
        // among-attached conditions (checked IN R1); failure falls back
        // down the trie to the bare n entry
        def viOk(s: String): Boolean =
          at(s.length + 1) == 'i' && sb.length - s.length - 1 >= r1 &&
            ViVowels.indexOf(at(s.length + 2)) >= 0 && sb.length - s.length - 2 >= r1
        def longOk(s: String): Boolean =
          sb.length - s.length - 2 >= r1 &&
            LongPairs.contains(sb.substring(sb.length - s.length - 2, sb.length - s.length))
        val attached = Seq("siin", "seen", "tten", "den")
        for (s <- attached if endsWith(s) && inR1(s)) {
          val ok = if (s == "seen") longOk(s) else viOk(s)
          if (ok) { del(s.length); endingRemoved = true; return }
          // fall through to the n case below
        }
        val hXn = Map("han" -> 'a', "hen" -> 'e', "hin" -> 'i', "hon" -> 'o',
          "hän" -> 'ä', "hön" -> 'ö')
        val plain = Seq("lla", "llä", "ssa", "ssä", "sta", "stä", "lta",
          "ltä", "lle", "ine", "ksi", "na", "nä", "ta", "tä")
        val all = (hXn.keys.toSeq ++ plain ++ Seq("tta", "ttä", "a", "ä", "n"))
          .sortBy(-_.length)
        all.find(s => endsWith(s) && inR1(s)) match {
          case Some(s) if hXn.contains(s) =>
            // the X gate looks back unlimited; failure fails the step
            if (at(4) == hXn(s)) { del(3); endingRemoved = true }
          case Some(s @ ("tta" | "ttä")) =>
            if (at(4) == 'e') { del(3); endingRemoved = true }
          case Some(s) if plain.contains(s) =>
            del(s.length); endingRemoved = true
          case Some(s @ ("a" | "ä")) =>
            if (isVowel(at(2)) && !isVowel(at(3)) && at(3) != '\u0000') {
              del(1); endingRemoved = true
            }
          case Some("n") =>
            del(1); endingRemoved = true
            if ((sb.length >= 2 && LongPairs.contains(sb.substring(sb.length - 2))) ||
                endsWith("ie")) del(1)
          case _ =>
        }
      }
      caseEnding()

      // Step 4: other endings — suffix in R2; the po gate unlimited
      Seq("imma", "immä", "impa", "impä", "immi", "impi", "eja", "ejä",
        "mma", "mmä", "mpa", "mpä", "mmi", "mpi")
        .sortBy(-_.length).find(s => endsWith(s) && inR2(s)) match {
        case Some(s @ ("mma" | "mmä" | "mpa" | "mpä" | "mmi" | "mpi")) =>
          if (!(at(s.length + 2) == 'p' && at(s.length + 1) == 'o')) del(s.length)
        case Some(s) => del(s.length)
        case _ =>
      }

      // Step 5: plurals
      if (endingRemoved) {
        if ((endsWith("i") || endsWith("j")) && inR1("i")) del(1)
      } else {
        // final t in R1 whose preceding vowel is ALSO in R1
        if (endsWith("t") && inR1("t") && isVowel(at(2)) && sb.length - 2 >= r1) {
          del(1)
          if (endsWith("imma") && inR2("imma")) del(4)
          else if (endsWith("mma") && inR2("mma") &&
                   !(at(5) == 'p' && at(4) == 'o')) del(3)
        }
      }

      // Step 6: tidying — steps a-d fully inside R1; undouble unlimited
      if (sb.length >= 2 && sb.length - 2 >= r1 &&
          LongPairs.contains(sb.substring(sb.length - 2))) del(1)
      if (sb.length >= 2 && sb.length - 2 >= r1 &&
          "aäei".indexOf(at(1)) >= 0 && !isVowel(at(2))) del(1)
      if ((endsWith("oj") || endsWith("uj")) && sb.length - 2 >= r1) del(1)
      if (endsWith("jo") && sb.length - 2 >= r1) del(1)
      var k = sb.length - 1
      while (k >= 0 && isVowel(sb.charAt(k))) k -= 1
      if (k >= 1 && !isVowel(sb.charAt(k)) && sb.charAt(k) == sb.charAt(k - 1))
        sb.deleteCharAt(k): Unit
      sb.toString
    }
  }

  // --------------------------------------------------------------- English

  /** Snowball English stemming algorithm (Porter2 — the reference's
    * SnowballFilter("English"); the classic 1980 Porter lives in
    * [[Porter]] behind PorterStemFilter). */
  object English {
    private def isVowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0

    private val Exceptions1 = Map(
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
      "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
      "early" -> "earli", "only" -> "onli", "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
      "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")
    private val Exceptions2 = Set("inning", "outing", "canning", "herring",
      "earring", "proceed", "exceed", "succeed")
    private val Doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
    private val LiEnding = "cdeghkmnrt"
    private val Step2 = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence",
      "anci" -> "ance", "abli" -> "able", "izer" -> "ize", "ator" -> "ate",
      "alli" -> "al", "bli" -> "ble", "ogi" -> "og", "li" -> "")
    private val Step3 = Seq("ational" -> "ate", "tional" -> "tion",
      "alize" -> "al", "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic",
      "ative" -> "", "ful" -> "", "ness" -> "")
    private val Step4 = Seq("ement", "ance", "ence", "able", "ible",
      "ment", "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
      "ion", "al", "er", "ic")

    def stem(word0: String): String = {
      // length gate on the ORIGINAL word, before the apostrophe strip
      if (word0.length <= 2) return word0
      Exceptions1.get(word0).foreach(e => return e)
      var w = word0
      if (w.startsWith("'")) w = w.substring(1)
      val sb = new StringBuilder(w)
      // mark consonant y
      if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        i += 1
      }

      val r1 = {
        val s = sb.toString
        if (s.startsWith("gener")) 5
        else if (s.startsWith("commun")) 6
        else if (s.startsWith("arsen")) 5
        else regionAfterVC(sb, 0, isVowel)
      }
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inR1(suf: String): Boolean = sb.length - suf.length >= r1
      def inR2(suf: String): Boolean = sb.length - suf.length >= r2
      def del(n: Int): Unit = sb.setLength(sb.length - n)
      def containsVowel(from: Int, until: Int): Boolean = {
        var j = from; var found = false
        while (!found && j < until) { found = isVowel(sb.charAt(j)); j += 1 }
        found
      }
      /** Short syllable ending at `end` (exclusive). */
      def endsShortSyllable: Boolean = {
        val n = sb.length
        if (n >= 3) {
          val c = sb.charAt(n - 1); val v = sb.charAt(n - 2); val p = sb.charAt(n - 3)
          if (!isVowel(c) && c != 'w' && c != 'x' && c != 'Y' &&
              isVowel(v) && !isVowel(p)) return true
        }
        n == 2 && isVowel(sb.charAt(0)) && !isVowel(sb.charAt(1))
      }
      def isShortWord: Boolean = endsShortSyllable && r1 >= sb.length

      // Step 0
      if (endsWith("'s'")) del(3)
      else if (endsWith("'s")) del(2)
      else if (endsWith("'")) del(1)

      // Step 1a
      if (endsWith("sses")) del(2)
      else if (endsWith("ied") || endsWith("ies")) {
        if (sb.length > 4) del(2) else del(1)
      } else if (endsWith("ss") || endsWith("us")) {
        // nothing
      } else if (endsWith("s")) {
        if (containsVowel(0, sb.length - 2)) del(1)
      }

      if (Exceptions2.contains(sb.toString)) {
        return sb.toString.replace('Y', 'y')
      }

      // Step 1b
      if (endsWith("eedly")) { if (inR1("eedly")) { del(5); sb.append("ee") } }
      else if (endsWith("eed")) { if (inR1("eed")) { del(3); sb.append("ee") } }
      else {
        val suf = Seq("ingly", "edly", "ing", "ed").find(endsWith)
        suf.foreach { s =>
          if (containsVowel(0, sb.length - s.length)) {
            del(s.length)
            if (endsWith("at") || endsWith("bl") || endsWith("iz")) sb.append("e")
            else if (sb.length >= 2 && Doubles.contains(sb.substring(sb.length - 2))) del(1)
            else if (isShortWord) sb.append("e")
          }
        }
      }

      // Step 1c: y/Y -> i after a non-vowel that is not the first letter
      if (sb.length > 2 && (sb.charAt(sb.length - 1) == 'y' || sb.charAt(sb.length - 1) == 'Y') &&
          !isVowel(sb.charAt(sb.length - 2)))
        sb.setCharAt(sb.length - 1, 'i')

      // Step 2 (R1): match-then-test, longest first
      Step2.sortBy(-_._1.length).find { case (s, _) => endsWith(s) } match {
        case Some((s, by)) if inR1(s) =>
          s match {
            case "ogi" =>
              if (sb.length >= 4 && sb.charAt(sb.length - 4) == 'l') { del(3); sb.append(by) }
            case "li" =>
              if (sb.length >= 3 && LiEnding.indexOf(sb.charAt(sb.length - 3)) >= 0) del(2)
            case _ => del(s.length); sb.append(by)
          }
        case _ =>
      }

      // Step 3 (R1; ative needs R2)
      Step3.sortBy(-_._1.length).find { case (s, _) => endsWith(s) } match {
        case Some((s, by)) if inR1(s) =>
          if (s == "ative") { if (inR2(s)) del(5) }
          else { del(s.length); sb.append(by) }
        case _ =>
      }

      // Step 4 (R2): ion needs preceding s/t
      Step4.sortBy(-_.length).find(endsWith) match {
        case Some("ion") =>
          if (inR2("ion") && sb.length >= 4 &&
              (sb.charAt(sb.length - 4) == 's' || sb.charAt(sb.length - 4) == 't')) del(3)
        case Some(s) if inR2(s) => del(s.length)
        case _ =>
      }

      // Step 5
      if (endsWith("e")) {
        if (inR2("e")) del(1)
        else if (inR1("e")) {
          // delete unless preceded by a short syllable
          val save = sb.charAt(sb.length - 1)
          sb.setLength(sb.length - 1)
          if (endsShortSyllable) sb.append(save) else ()
        }
      } else if (endsWith("ll") && inR2("l")) del(1)

      sb.toString.replace('Y', 'y')
    }
  }

  // ---------------------------------------------- Danish/Norwegian/Swedish

  /** The Scandinavian trio shares R1-with-3-letter-minimum and the
    * s-ending gate; only the suffix tables differ. */
  sealed abstract class Scandinavian {
    protected def vowels: String
    protected def isVowel(c: Char): Boolean = vowels.indexOf(c) >= 0

    protected final class W(word: String) {
      val sb = new StringBuilder(word)
      var r1: Int = regionAfterVC(sb, 0, isVowel)
      if (r1 < 3) r1 = 3
      if (r1 > sb.length) r1 = sb.length
      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inR1(suf: String): Boolean = sb.length - suf.length >= r1
      def del(n: Int): Unit = sb.setLength(sb.length - n)
      def charBefore(suf: String): Char =
        if (sb.length > suf.length) sb.charAt(sb.length - suf.length - 1) else ' '
    }
  }

  /** Snowball Danish stemming algorithm. */
  object Danish extends Scandinavian {
    protected def vowels = "aeiouyæåø"
    private val Step1 = Seq("erendes", "erende", "hedens", "ethed",
      "erede", "heden", "heder", "endes", "ernes", "erens", "erets",
      "ered", "ende", "erne", "eren", "erer", "heds", "enes", "eres",
      "ens", "ere", "ene", "ers", "ets", "eret", "hed", "en", "er",
      "es", "et", "e").sortBy(-_.length)
    private val SEnding = "abcdfghjklmnoprtvyzå"

    def stem(word: String): String = {
      if (word.length < 3) return word
      val w = new W(word)
      import w._
      // Step 1
      Step1.find(s => endsWith(s) && inR1(s)) match {
        case Some(s) => del(s.length)
        case None =>
          if (endsWith("s") && inR1("s") && SEnding.indexOf(charBefore("s")) >= 0)
            del(1)
      }
      // Step 2: consonant-pair tail loses its last letter
      for (p <- Seq("gd", "dt", "gt", "kt"))
        if (endsWith(p) && inR1(p) && sb.endsWith(p)) del(1)
      // Step 3
      if (endsWith("igst")) del(2)
      Seq("elig", "lig", "els", "ig").find(s => endsWith(s) && inR1(s)) match {
        case Some(s) =>
          del(s.length)
          for (p <- Seq("gd", "dt", "gt", "kt"))
            if (endsWith(p) && inR1(p) && sb.endsWith(p)) del(1)
        case None =>
          if (endsWith("løst") && inR1("løst")) del(1)
      }
      // Step 4: undouble a final double consonant in R1
      if (sb.length >= 2 && sb.length - 1 >= r1 &&
          sb.charAt(sb.length - 1) == sb.charAt(sb.length - 2) &&
          !isVowel(sb.charAt(sb.length - 1))) del(1)
      sb.toString
    }
  }

  /** Snowball Norwegian stemming algorithm. */
  object Norwegian extends Scandinavian {
    protected def vowels = "aeiouyæåø"
    private val Step1 = Seq("hetenes", "hetene", "hetens", "heten",
      "heter", "endes", "enes", "edes", "ende", "ande", "ane", "ene",
      "ens", "ers", "ets", "het", "ast", "ede", "en", "ar", "er", "as",
      "es", "et", "a", "e").sortBy(-_.length)
    private val SEnding = "bcdfghjlmnoprtvyz"

    def stem(word: String): String = {
      if (word.length < 3) return word
      val w = new W(word)
      import w._
      // Step 1 (longest among ALL alternatives, erte/ert included)
      (Step1 ++ Seq("erte", "ert", "s")).sortBy(-_.length)
        .find(s => endsWith(s) && inR1(s)) match {
        case Some("erte") => del(4); sb.append("er")
        case Some("ert")  => del(3); sb.append("er")
        case Some("s") =>
          val pre = charBefore("s")
          val ok = SEnding.indexOf(pre) >= 0 ||
            (pre == 'k' && {
              val i = sb.length - 3
              i < 0 || !isVowel(sb.charAt(i))
            })
          if (ok) del(1)
        case Some(s) => del(s.length)
        case None =>
      }
      // Step 2: dt/vt lose the t
      if ((endsWith("dt") || endsWith("vt")) && inR1("dt")) del(1)
      // Step 3
      Seq("hetslov", "eleg", "elig", "elov", "slov", "leg", "eig",
        "lig", "els", "lov", "ig").find(s => endsWith(s) && inR1(s))
        .foreach(s => del(s.length))
      sb.toString
    }
  }

  /** Snowball Swedish stemming algorithm. */
  object Swedish extends Scandinavian {
    protected def vowels = "aeiouyäåö"
    private val Step1 = Seq("heterna", "hetens", "anden", "andes",
      "arnas", "ernas", "ornas", "arens", "heten", "heter", "arna",
      "erna", "orna", "ande", "arne", "aste", "aren", "ades", "erns",
      "andet", "ade", "are", "ern", "ens", "het", "ast", "ad", "en",
      "ar", "er", "or", "as", "es", "at", "a", "e").sortBy(-_.length)
    private val SEnding = "bcdfghjklmnoprtvy"

    def stem(word: String): String = {
      if (word.length < 3) return word
      val w = new W(word)
      import w._
      Step1.find(s => endsWith(s) && inR1(s)) match {
        case Some(s) => del(s.length)
        case None =>
          if (endsWith("s") && inR1("s") && SEnding.indexOf(charBefore("s")) >= 0)
            del(1)
      }
      for (p <- Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt"))
        if (endsWith(p) && inR1(p) && sb.endsWith(p)) del(1)
      Seq("fullt", "löst", "lig", "els", "ig").find(s => endsWith(s) && inR1(s)) match {
        case Some("fullt") => del(1)
        case Some("löst")  => del(1)
        case Some(s)       => del(s.length)
        case None =>
      }
      sb.toString
    }
  }

  // -------------------------------------------------------------- Romanian

  /** Snowball Romanian stemming algorithm (cedilla forms ş/ţ, as the
    * published algorithm and test vocabulary use). */
  object Romanian {
    private def isVowel(c: Char): Boolean = "aăâeiîou".indexOf(c) >= 0

    private def rvOf(s: CharSequence): Int = {
      val n = s.length
      if (n < 3) return n
      if (!isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && !isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else if (isVowel(s.charAt(0)) && isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else 3
    }

    // step 1 combining suffixes: suffix -> replacement
    private val Step1 = Seq(
      "abilitate" -> "abil", "abilitati" -> "abil", "abilităi" -> "abil",
      "abilităţi" -> "abil", "ibilitate" -> "ibil",
      "ivitate" -> "iv", "ivitati" -> "iv", "ivităi" -> "iv", "ivităţi" -> "iv",
      "icitate" -> "ic", "icitati" -> "ic", "icităi" -> "ic", "icităţi" -> "ic",
      "icatori" -> "ic", "icator" -> "ic",
      "iciva" -> "ic", "icive" -> "ic", "icivi" -> "ic", "icivă" -> "ic", "iciv" -> "ic",
      "icala" -> "ic", "icale" -> "ic", "icali" -> "ic", "icală" -> "ic", "ical" -> "ic",
      "ativa" -> "at", "ative" -> "at", "ativi" -> "at", "ativă" -> "at", "ativ" -> "at",
      "aţiune" -> "at", "atoare" -> "at", "atori" -> "at", "ator" -> "at",
      "ătoare" -> "at", "ători" -> "at", "ător" -> "at",
      "itiva" -> "it", "itive" -> "it", "itivi" -> "it", "itivă" -> "it", "itiv" -> "it",
      "iţiune" -> "it", "itoare" -> "it", "itori" -> "it", "itor" -> "it")
      .sortBy(-_._1.length)

    private val Step2Del = Seq("itate", "itati", "ităţi", "abila", "abile",
      "abili", "abilă", "ibila", "ibile", "ibili", "ibilă", "atori", "oasa",
      "oasă", "oase", "anta", "ante", "anti", "antă", "ator", "abil",
      "ibil", "ităi", "ata", "ată", "ati", "ate", "uta", "ută", "uti",
      "ute", "ita", "ită", "iti", "ite", "ica", "ice", "ici", "ică",
      "iva", "ive", "ivi", "ivă", "osi", "oşi", "ant", "at", "ut", "it",
      "ic", "os", "iv").sortBy(-_.length)
    private val Step2Ist = Seq("isme", "ista", "iste", "isti", "istă",
      "işti", "ism", "ist").sortBy(-_.length)

    private val Verb1 = Seq("aserăţi", "iserăţi", "âserăţi", "userăţi",
      "aserăm", "iserăm", "âserăm", "userăm", "aseră", "iseră", "âseră",
      "useră", "aseşi", "iseşi", "âseşi", "useşi", "asem", "isem", "âsem",
      "usem", "arăţi", "irăţi", "ârăţi", "urăţi", "arăm", "irăm", "ârăm",
      "urăm", "ară", "iră", "âră", "ură", "aşi", "işi", "âşi", "uşi",
      "ează", "ească", "eaţi", "iaţi", "eze", "ezi", "ez", "esc",
      "eşti", "eşte", "ăsc", "ăşti", "ăşte", "indu", "ându", "ind", "ând",
      "are", "ere", "ire", "âre", "eam", "eai", "eau", "iam", "iai",
      "iau", "ase", "ise", "âse", "use", "ea", "ia", "ui", "âi", "am",
      "ai", "au").map(_ -> 1)
    private val Verb2 = Seq("seserăţi", "seserăm", "seseşi", "sesem",
      "seseră", "serăţi", "serăm", "seră", "sese", "seşi", "sei", "se",
      "aţi", "eţi", "iţi", "âţi", "ăm", "em", "im", "âm").map(_ -> 2)

    def stem(word0: String): String = {
      if (word0.length < 2) return word0
      val sb = new StringBuilder(word0)
      // mark i/u between vowels as consonants
      var i = 1
      while (i < sb.length - 1) {
        val c = sb.charAt(i)
        if ((c == 'i' || c == 'u') && isVowel(sb.charAt(i - 1)) && isVowel(sb.charAt(i + 1)))
          sb.setCharAt(i, c.toUpper)
        i += 1
      }
      val rv = rvOf(sb)
      val r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inRegion(suf: String, r: Int): Boolean = sb.length - suf.length >= r
      def del(n: Int): Unit = sb.setLength(sb.length - n)
      def replace(suf: String, by: String): Unit = { del(suf.length); sb.append(by) }

      // Step 0: removal of plurals — plain `[substring] R1 among`:
      // the LONGEST match is chosen first and the R1 test then decides,
      // with NO fallback to a shorter suffix
      Seq("iilor", "ului", "elor", "iile", "ilor", "atei", "aţie", "aţia",
        "aua", "ele", "iua", "iei", "ile", "ul", "ea", "ii")
        .sortBy(-_.length)
        .find(endsWith) match {
        case Some(s) if inRegion(s, r1) => s match {
          case "ul" | "ului" => del(s.length)
          case "aua" => replace("aua", "a")
          case "ea" | "ele" | "elor" => replace(s, "e")
          case "ii" | "iua" | "iei" | "iile" | "iilor" | "ilor" => replace(s, "i")
          case "ile" =>
            if (!(sb.length >= 5 && sb.substring(sb.length - 5, sb.length - 3) == "ab"))
              replace("ile", "i")
          case "atei" => replace("atei", "at")
          case "aţie" | "aţia" => replace(s, "aţi")
          case _ =>
        }
        case _ =>
      }

      // Step 1: combining suffixes, repeated to fixpoint (match-then-R1)
      var removed = false
      var changed = true
      while (changed) {
        changed = false
        Step1.find { case (s, _) => endsWith(s) } match {
          case Some((s, by)) if inRegion(s, r1) =>
            replace(s, by); changed = true; removed = true
          case _ =>
        }
      }

      // Step 2: standard suffixes (R2)
      (Step2Del.map(_ -> 0) ++ Step2Ist.map(_ -> 1) ++
        Seq("iune" -> 2, "iuni" -> 2)).sortBy(-_._1.length)
        .find { case (s, _) => endsWith(s) } match {
        case Some((s, 0)) if inRegion(s, r2) => del(s.length); removed = true
        case Some((s, 1)) if inRegion(s, r2) => replace(s, "ist"); removed = true
        case Some((s, 2)) if inRegion(s, r2) &&
            sb.length > s.length && sb.charAt(sb.length - s.length - 1) == 'ţ' =>
          del(s.length); sb.setCharAt(sb.length - 1, 't'); removed = true
        case _ =>
      }

      // Step 3: verb suffixes (only if steps 1-2 removed nothing; RV)
      if (!removed) {
        (Verb1 ++ Verb2).sortBy(-_._1.length)
          .find { case (s, _) => endsWith(s) && inRegion(s, rv) } match {
          case Some((s, 1)) =>
            val i2 = sb.length - s.length - 1
            if (i2 >= rv && (!isVowel(sb.charAt(i2)) || sb.charAt(i2) == 'u'))
              del(s.length)
          case Some((s, 2)) => del(s.length)
          case _ =>
        }
      }

      // Step 4: final vowel — match-then-RV, no fallback ('anglie' keeps
      // its 'ie' because the longest match fails the RV test)
      Seq("ie", "a", "e", "i", "ă").sortBy(-_.length)
        .find(endsWith) match {
        case Some(s) if inRegion(s, rv) => del(s.length)
        case _ =>
      }

      var j = 0
      while (j < sb.length) {
        val c = sb.charAt(j)
        if (c == 'I' || c == 'U') sb.setCharAt(j, c.toLower)
        j += 1
      }
      sb.toString
    }
  }

  // --------------------------------------------------------------- Russian

  /** Snowball Russian stemming algorithm (Cyrillic). All suffix matching
    * is confined to RV (the region after the first vowel); group-1 verb /
    * gerund / participle endings must follow а or я. Snowball `among`
    * semantics: the LONGEST matching suffix is chosen first and its
    * condition then decides — a failed condition does NOT fall back to a
    * shorter suffix. */
  object Russian {
    private def isVowel(c: Char): Boolean = "аеиоуыэюя".indexOf(c) >= 0

    // (suffix, mustFollowAYa)
    private val PerfGerund = Seq(
      ("вшись", true), ("вши", true), ("в", true),
      ("ившись", false), ("ывшись", false), ("ивши", false),
      ("ывши", false), ("ив", false), ("ыв", false))
    private val Adjective = Seq("ими", "ыми", "его", "ого", "ему", "ому",
      "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
      "ом", "их", "ых", "ею", "ою", "ую", "юю", "ая", "яя").map((_, false))
    private val Participle = Seq(
      ("ем", true), ("нн", true), ("вш", true), ("ющ", true), ("щ", true),
      ("ивш", false), ("ывш", false), ("ующ", false))
    private val Verb = Seq(
      ("ла", true), ("на", true), ("ете", true), ("йте", true), ("ли", true),
      ("й", true), ("л", true), ("ем", true), ("н", true), ("ло", true),
      ("но", true), ("ет", true), ("ют", true), ("ны", true), ("ть", true),
      ("ешь", true), ("нно", true),
      ("ила", false), ("ыла", false), ("ена", false), ("ейте", false),
      ("уйте", false), ("ите", false), ("или", false), ("ыли", false),
      ("ей", false), ("уй", false), ("ил", false), ("ыл", false),
      ("им", false), ("ым", false), ("ен", false), ("ило", false),
      ("ыло", false), ("ено", false), ("ят", false), ("ует", false),
      ("уют", false), ("ит", false), ("ыт", false), ("ены", false),
      ("ить", false), ("ыть", false), ("ишь", false), ("ую", false),
      ("ю", false))
    private val Noun = Seq("иями", "ями", "ами", "ией", "иям", "ием",
      "иях", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
      "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья", "а", "е",
      "и", "й", "о", "у", "ы", "ь", "ю", "я").map((_, false))

    def stem(word0: String): String = {
      val sb = new StringBuilder(word0.replace('ё', 'е'))
      var rv = 0
      while (rv < sb.length && !isVowel(sb.charAt(rv))) rv += 1
      rv = if (rv < sb.length) rv + 1 else sb.length
      val r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inRV(suf: String): Boolean = sb.length - suf.length >= rv
      def del(n: Int): Unit = sb.setLength(sb.length - n)

      /** Longest in-RV match, then its а/я condition decides — no
        * fallback on condition failure (Snowball among semantics). */
      def tryDel(groups: Seq[(String, Boolean)]): Boolean =
        groups.sortBy(-_._1.length)
          .find { case (s, _) => endsWith(s) && inRV(s) } match {
          case Some((s, needsAYa)) =>
            val i = sb.length - s.length - 1
            val ok = !needsAYa ||
              (i >= rv && (sb.charAt(i) == 'а' || sb.charAt(i) == 'я'))
            if (ok) del(s.length)
            ok
          case None => false
        }

      // Step 1
      if (!tryDel(PerfGerund)) {
        if (endsWith("ся") && inRV("ся")) del(2)
        else if (endsWith("сь") && inRV("сь")) del(2)
        val adj = tryDel(Adjective)
        if (adj) { tryDel(Participle); () }
        else if (!tryDel(Verb)) { tryDel(Noun); () }
      }
      // Step 2: final и
      if (endsWith("и") && inRV("и")) del(1)
      // Step 3: derivational (R2)
      if (endsWith("ость") && sb.length - 4 >= r2) del(4)
      else if (endsWith("ост") && sb.length - 3 >= r2) del(3)
      // Step 4: superlative / нн undouble / final ь — longest alternative
      if (endsWith("ейше") && inRV("ейше")) {
        del(4)
        if (endsWith("нн")) del(1)
      } else if (endsWith("ейш") && inRV("ейш")) {
        del(3)
        if (endsWith("нн")) del(1)
      } else if (endsWith("нн") && inRV("н")) {
        del(1)
      } else if (endsWith("ь") && inRV("ь")) {
        del(1)
      }
      sb.toString
    }
  }

  // ----------------------------------------------------------------- Dutch

  /** Snowball Dutch stemming algorithm. */
  object Dutch {
    private def isVowel(c: Char): Boolean = "aeiouyè".indexOf(c) >= 0

    def stem(word0: String): String = {
      if (word0.length < 3) return deAccent(word0)
      // remove umlauts and acute accents; grave accents stay
      val sb = new StringBuilder(deAccent(word0))
      // mark initial y, y after a vowel, and i between vowels as consonants
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == 'y' && (i == 0 || isVowel(sb.charAt(i - 1))))
          sb.setCharAt(i, 'Y')
        else if (c == 'i' && i > 0 && i + 1 < sb.length &&
                 isVowel(sb.charAt(i - 1)) && isVowel(sb.charAt(i + 1)))
          sb.setCharAt(i, 'I')
        i += 1
      }

      var r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)
      if (r1 < 3) r1 = 3
      if (r1 > sb.length) r1 = sb.length

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inR1(suf: String): Boolean = sb.length - suf.length >= r1
      def inR2(suf: String): Boolean = sb.length - suf.length >= r2
      def del(n: Int): Unit = sb.setLength(sb.length - n)
      def undouble(): Unit =
        for (p <- Seq("kk", "dd", "tt")) if (sb.endsWith(p)) del(1)
      def enPreceded(suf: String): Boolean = {
        val i = sb.length - suf.length - 1
        i >= 0 && !isVowel(sb.charAt(i)) &&
          !(i >= 2 && sb.substring(i - 2, i + 1) == "gem")
      }

      // Step 1
      if (endsWith("heden")) {
        if (inR1("heden")) { del(5); sb.append("heid") }
      } else if (endsWith("ene") || endsWith("en")) {
        val suf = if (endsWith("ene")) "ene" else "en"
        if (inR1(suf) && enPreceded(suf)) { del(suf.length); undouble() }
      } else if (endsWith("se") || endsWith("s")) {
        val suf = if (endsWith("se")) "se" else "s"
        val i = sb.length - suf.length - 1
        if (inR1(suf) && i >= 0 && !isVowel(sb.charAt(i)) && sb.charAt(i) != 'j')
          del(suf.length)
      }

      // Step 2: delete e in R1 after a non-vowel; record for step 3b's bar
      var eRemoved = false
      if (endsWith("e") && inR1("e") && sb.length >= 2 && !isVowel(sb.charAt(sb.length - 2))) {
        del(1); undouble(); eRemoved = true
      }

      // Step 3a: heid (not after c), then the en treatment again
      if (endsWith("heid") && inR2("heid") && sb.length >= 5 &&
          sb.charAt(sb.length - 5) != 'c') {
        del(4)
        if (endsWith("en") && inR1("en") && enPreceded("en")) { del(2); undouble() }
      }

      // Step 3b: d-suffixes
      Seq("end", "ing", "lijk", "baar", "bar", "ig").sortBy(-_.length)
        .find(endsWith) match {
        case Some(suf @ ("end" | "ing")) =>
          if (inR2(suf)) {
            del(3)
            if (endsWith("ig") && inR2("ig") && sb.charAt(sb.length - 3) != 'e') del(2)
            else undouble()
          }
        case Some("ig") =>
          if (inR2("ig") && !(sb.length >= 3 && sb.charAt(sb.length - 3) == 'e')) del(2)
        case Some("lijk") =>
          if (inR2("lijk")) {
            del(4)
            if (endsWith("e") && inR1("e") && sb.length >= 2 &&
                !isVowel(sb.charAt(sb.length - 2))) { del(1); undouble() }
          }
        case Some("baar") =>
          if (inR2("baar")) del(4)
        case Some("bar") =>
          if (inR2("bar") && eRemoved) del(3)
        case _ =>
      }

      // Step 4: undouble vowel in C-VV-D (D a non-vowel other than I)
      if (sb.length >= 4) {
        val d = sb.charAt(sb.length - 1)
        val v1 = sb.charAt(sb.length - 2)
        val v2 = sb.charAt(sb.length - 3)
        val c = sb.charAt(sb.length - 4)
        if (!isVowel(d) && d != 'I' && v1 == v2 && "aeou".indexOf(v1) >= 0 && !isVowel(c)) {
          sb.deleteCharAt(sb.length - 2): Unit
        }
      }

      var j = 0
      while (j < sb.length) {
        val c = sb.charAt(j)
        if (c == 'Y' || c == 'I') sb.setCharAt(j, c.toLower)
        j += 1
      }
      sb.toString
    }

    private def deAccent(s: String): String = s.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
  }

  // --------------------------------------------------------------- Italian

  /** Snowball Italian stemming algorithm. */
  object Italian {
    private def isVowel(c: Char): Boolean = "aeiouàèìòù".indexOf(c) >= 0

    private def rvOf(s: CharSequence): Int = {
      val n = s.length
      if (n < 3) return n
      if (!isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && !isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else if (isVowel(s.charAt(0)) && isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else 3
    }

    private val Pronouns = Seq("gliela", "gliele", "glieli", "glielo",
      "gliene", "sene", "mela", "mele", "meli", "melo", "mene", "tela",
      "tele", "teli", "telo", "tene", "cela", "cele", "celi", "celo",
      "cene", "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la",
      "le", "li", "lo", "mi", "ne", "si", "ti", "vi")

    private val Step1Del = Seq("atrice", "atrici", "abile", "abili",
      "ibile", "ibili", "mente", "anza", "anze", "iche", "ichi", "ismo",
      "ismi", "ista", "iste", "isti", "istà", "istè", "istì", "ante",
      "anti", "ico", "ici", "ica", "ice", "oso", "osi", "osa", "ose")
    private val Step1Ator = Seq("azione", "azioni", "atore", "atori")
    private val Step2 = Seq("erebbero", "irebbero", "assero", "assimo",
      "eranno", "erebbe", "eremmo", "ereste", "eresti", "essero", "iranno",
      "irebbe", "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
      "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
      "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
      "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo", "enda",
      "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo", "immo",
      "irai", "irei", "isca", "isce", "isci", "isco", "ano", "are", "ata",
      "ate", "ati", "ato", "ava", "avi", "avo", "erà", "ere", "erò",
      "ete", "eva", "evi", "evo", "irà", "ire", "irò", "ita", "ite",
      "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute", "uti",
      "uto", "ar", "ir")

    def stem(word0: String): String = {
      if (word0.length < 2) return word0
      // replace acute accents by grave
      val sb = new StringBuilder(word0.map {
        case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
        case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
      })
      // mark u/i between vowels, and u after q, as consonants
      var i = 1
      while (i < sb.length) {
        val c = sb.charAt(i)
        if ((c == 'u' || c == 'i') && i + 1 < sb.length &&
            isVowel(sb.charAt(i - 1)) && isVowel(sb.charAt(i + 1)))
          sb.setCharAt(i, c.toUpper)
        else if (c == 'u' && sb.charAt(i - 1) == 'q')
          sb.setCharAt(i, 'U')
        i += 1
      }

      val rv = rvOf(sb)
      val r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inRegion(suf: String, r: Int): Boolean = sb.length - suf.length >= r
      def del(n: Int): Unit = sb.setLength(sb.length - n)

      // Step 0: attached pronoun after ando/endo (delete) or ar/er/ir
      // (replace pronoun with e); the verb ending must be in RV
      Pronouns.find(p => endsWith(p) && inRegion(p, rv)) match {
        case Some(p) =>
          val head = sb.substring(0, sb.length - p.length)
          if ((head.endsWith("ando") || head.endsWith("endo")) &&
              sb.length - p.length - 4 >= rv) {
            del(p.length)
          } else if ((head.endsWith("ar") || head.endsWith("er") || head.endsWith("ir")) &&
                     sb.length - p.length - 2 >= rv) {
            del(p.length); sb.append("e")
          }
        case None =>
      }

      // Step 1: standard suffix removal
      val len0 = sb.length
      val all1 = (Step1Del ++ Step1Ator ++ Seq("amente", "amento", "amenti",
        "imento", "imenti", "logia", "logie", "uzione", "uzioni", "usione",
        "usioni", "enza", "enze", "ità", "ivo", "ivi", "iva", "ive"))
        .sortBy(-_.length)
      all1.find(endsWith) match {
        case Some("amente") =>
          if (inRegion("amente", r1)) {
            del(6)
            if (sb.endsWith("iv") && inRegion("iv", r2)) {
              del(2)
              if (sb.endsWith("at") && inRegion("at", r2)) del(2)
            } else {
              Seq("os", "ic", "abil").find(p => sb.endsWith(p) && inRegion(p, r2))
                .foreach(p => del(p.length))
            }
          }
        case Some(suf) if Step1Del.contains(suf) =>
          if (inRegion(suf, r2)) del(suf.length)
        case Some(suf) if Step1Ator.contains(suf) =>
          if (inRegion(suf, r2)) {
            del(suf.length)
            if (sb.endsWith("ic") && inRegion("ic", r2)) del(2)
          }
        case Some(suf @ ("amento" | "amenti" | "imento" | "imenti")) =>
          if (inRegion(suf, rv)) del(suf.length)
        case Some(suf @ ("logia" | "logie")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("log") }
        case Some(suf @ ("uzione" | "uzioni" | "usione" | "usioni")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("u") }
        case Some(suf @ ("enza" | "enze")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("ente") }
        case Some("ità") =>
          if (inRegion("ità", r2)) {
            del(3)
            Seq("abil", "ic", "iv").find(p => sb.endsWith(p) && inRegion(p, r2))
              .foreach(p => del(p.length))
          }
        case Some(suf @ ("ivo" | "ivi" | "iva" | "ive")) =>
          if (inRegion(suf, r2)) {
            del(suf.length)
            if (sb.endsWith("at") && inRegion("at", r2)) {
              del(2)
              if (sb.endsWith("ic") && inRegion("ic", r2)) del(2)
            }
          }
        case _ =>
      }

      // Step 2 (verb suffixes, only if step 1 removed nothing): the search
      // is setlimit-to-RV — only suffixes entirely inside RV match
      if (sb.length == len0) {
        Step2.sortBy(-_.length).find(s => endsWith(s) && inRegion(s, rv))
          .foreach(s => del(s.length))
      }

      // Step 3a: final vowel (and a preceding i) in RV
      Seq("a", "e", "i", "o", "à", "è", "ì", "ò").find(endsWith) match {
        case Some(suf) if inRegion(suf, rv) =>
          del(1)
          if (endsWith("i") && inRegion("i", rv)) del(1)
        case _ =>
      }
      // Step 3b: ch/gh -> c/g in RV
      if ((endsWith("ch") || endsWith("gh")) && inRegion("ch", rv)) del(1)

      var j = 0
      while (j < sb.length) {
        val c = sb.charAt(j)
        if (c == 'U' || c == 'I' || c == 'Y') sb.setCharAt(j, c.toLower)
        j += 1
      }
      sb.toString
    }
  }

  // ------------------------------------------------------------ Portuguese

  /** Snowball Portuguese stemming algorithm. The nasal vowels ã/õ are
    * rewritten to the two-character forms a~/o~ during stemming (making
    * them non-vowels, as the published algorithm specifies) and restored
    * at the end. */
  object Portuguese {
    private def isVowel(c: Char): Boolean = "aeiouáéíóúâêô".indexOf(c) >= 0

    private def rvOf(s: CharSequence): Int = {
      val n = s.length
      if (n < 3) return n
      if (!isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && !isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else if (isVowel(s.charAt(0)) && isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && isVowel(s.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else 3
    }

    private val Step1Del = Seq("amentos", "imentos", "amento", "imento",
      "adoras", "adores", "ismos", "istas", "adora", "antes", "ância",
      "ezas", "icos", "icas", "ismo", "ável", "ível", "ista", "osos",
      "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa")
    private val Step2 = Seq("aríamos", "eríamos", "iríamos", "ássemos",
      "êssemos", "íssemos", "aríeis", "eríeis", "iríeis", "ásseis",
      "ésseis", "ísseis", "áramos", "éramos", "íramos", "ávamos", "aremos",
      "eremos", "iremos", "ariam", "eriam", "iriam", "assem", "essem",
      "issem", "ara~o", "era~o", "ira~o", "arias", "erias", "irias",
      "ardes", "erdes", "irdes", "asses", "esses", "isses", "astes",
      "estes", "istes", "áreis", "areis", "éreis", "ereis", "íreis",
      "ireis", "áveis", "íamos", "armos", "ermos", "irmos", "aria",
      "eria", "iria", "asse", "esse", "isse", "aste", "este", "iste",
      "arei", "erei", "irei", "aram", "eram", "iram", "avam", "arem",
      "erem", "irem", "ando", "endo", "indo", "adas", "idas", "arás",
      "aras", "erás", "eras", "irás", "avas", "ares", "eres", "ires",
      "íeis", "ados", "idos", "ámos", "amos", "emos", "imos", "iras",
      "ada", "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam",
      "ado", "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em",
      "ar", "er", "ir", "as", "es", "is", "eu", "iu", "ou")

    def stem(word0: String): String = {
      if (word0.length < 2) return word0
      val sb = new StringBuilder()
      word0.foreach {
        case 'ã' => sb.append("a~")
        case 'õ' => sb.append("o~")
        case c => sb.append(c)
      }

      val rv = rvOf(sb)
      val r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inRegion(suf: String, r: Int): Boolean = sb.length - suf.length >= r
      def del(n: Int): Unit = sb.setLength(sb.length - n)

      // Step 1: standard suffix removal
      val len0 = sb.length
      val all1 = (Step1Del ++ Seq("aça~o", "aço~es", "logias", "logia",
        "ências", "ência", "amente", "mente", "idades",
        "idade", "ivas", "ivos", "iva", "ivo", "iras", "ira")).sortBy(-_.length)
      all1.find(endsWith) match {
        case Some("amente") =>
          if (inRegion("amente", r1)) {
            del(6)
            if (sb.endsWith("iv") && inRegion("iv", r2)) {
              del(2)
              if (sb.endsWith("at") && inRegion("at", r2)) del(2)
            } else {
              Seq("os", "ic", "ad").find(p => sb.endsWith(p) && inRegion(p, r2))
                .foreach(_ => del(2))
            }
          }
        case Some("mente") =>
          if (inRegion("mente", r2)) {
            del(5)
            Seq("ante", "avel", "ível").find(p => sb.endsWith(p) && inRegion(p, r2))
              .foreach(p => del(p.length))
          }
        case Some(suf) if Step1Del.contains(suf) || suf == "aça~o" || suf == "aço~es" =>
          if (inRegion(suf, r2)) del(suf.length)
        case Some(suf @ ("logias" | "logia")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("log") }
        case Some(suf @ ("ências" | "ência")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("ente") }
        case Some(suf @ ("idades" | "idade")) =>
          if (inRegion(suf, r2)) {
            del(suf.length)
            Seq("abil", "ic", "iv").find(p => sb.endsWith(p) && inRegion(p, r2))
              .foreach(p => del(p.length))
          }
        case Some(suf @ ("ivas" | "ivos" | "iva" | "ivo")) =>
          if (inRegion(suf, r2)) {
            del(suf.length)
            if (sb.endsWith("at") && inRegion("at", r2)) del(2)
          }
        case Some(suf @ ("iras" | "ira")) =>
          if (inRegion(suf, rv) && sb.length - suf.length >= 1 &&
              sb.charAt(sb.length - suf.length - 1) == 'e') {
            del(suf.length); sb.append("ir")
          }
        case _ =>
      }

      // Step 2 (verb suffixes, only if step 1 removed nothing): setlimit-RV
      if (sb.length == len0) {
        Step2.sortBy(-_.length).find(s => endsWith(s) && inRegion(s, rv))
          .foreach(s => del(s.length))
      }

      // Step 3 (if steps 1-2 changed the word): delete i after c in RV
      if (sb.length != len0) {
        if (endsWith("i") && inRegion("i", rv) && sb.length >= 2 &&
            sb.charAt(sb.length - 2) == 'c') del(1)
      } else {
        // Step 4 (residual suffix)
        Seq("os", "a", "i", "o", "á", "í", "ó")
          .find(s => endsWith(s) && inRegion(s, rv))
          .foreach(s => del(s.length))
      }

      // Step 5 (always): final e/é/ê in RV, with gu/ci undoubling; ç -> c
      if ((endsWith("e") || endsWith("é") || endsWith("ê")) && inRegion("e", rv)) {
        del(1)
        if ((endsWith("gu") || endsWith("ci")) && sb.length - 1 >= rv) del(1)
      } else if (endsWith("ç")) {
        sb.setCharAt(sb.length - 1, 'c')
      }

      // restore nasal vowels
      val out = new StringBuilder(sb.length)
      var j = 0
      while (j < sb.length) {
        val c = sb.charAt(j)
        if (c == 'a' && j + 1 < sb.length && sb.charAt(j + 1) == '~') { out.append('ã'); j += 2 }
        else if (c == 'o' && j + 1 < sb.length && sb.charAt(j + 1) == '~') { out.append('õ'); j += 2 }
        else { out.append(c); j += 1 }
      }
      out.toString
    }
  }

  // ---------------------------------------------------------------- French

  /** Snowball French stemming algorithm. */
  object French {
    private def isVowel(c: Char): Boolean = "aeiouyâàëéêèïîôûù".indexOf(c) >= 0

    private val Step1Simple = Seq("ances", "iqUes", "ismes", "ables", "istes",
      "ance", "iqUe", "isme", "able", "iste", "eux")
    private val Step1Ateur = Seq("atrices", "atrice", "ateurs", "ations",
      "ateur", "ation")
    private val Step2a = Seq("issaIent", "issantes", "iraIent", "issante",
      "issants", "issions", "irions", "issais", "issait", "issant",
      "issent", "issiez", "issons", "irais", "irait", "irent", "iriez",
      "irons", "iront", "isses", "issez", "îmes", "îtes", "irai", "iras",
      "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i")
    private val Step2bIons = Seq("ions")
    private val Step2bEr = Seq("eraIent", "erions", "èrent", "erais",
      "erait", "eriez", "erons", "eront", "erai", "eras", "erez", "ées",
      "era", "iez", "ée", "és", "er", "ez", "é")
    private val Step2bA = Seq("assions", "assent", "assiez", "aIent",
      "antes", "asses", "âmes", "âtes", "ante", "ants", "asse", "ais",
      "ait", "ant", "ât", "ai", "as", "a")

    def stem(word: String): String = {
      if (word.length < 2) return word
      val sb = new StringBuilder(word)

      // prelude: mark u/i between vowels, y next to a vowel, u after q as
      // consonants (upper case), scanning left to right over the current
      // state (an already-marked char no longer counts as a vowel)
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (i > 0 && isVowel(sb.charAt(i - 1)) && i + 1 < sb.length && isVowel(sb.charAt(i + 1)) &&
            (c == 'u' || c == 'i')) {
          sb.setCharAt(i, c.toUpper)
        } else if (c == 'y' &&
                   ((i > 0 && isVowel(sb.charAt(i - 1))) ||
                    (i + 1 < sb.length && isVowel(sb.charAt(i + 1))))) {
          sb.setCharAt(i, 'Y')
        } else if (c == 'u' && i > 0 && sb.charAt(i - 1) == 'q') {
          sb.setCharAt(i, 'U')
        }
        i += 1
      }

      val rv: Int = {
        val n = sb.length
        if (n >= 3 && (sb.substring(0, 3) == "par" || sb.substring(0, 3) == "col" ||
                       sb.substring(0, 3) == "tap")) 3
        else if (n >= 3 && isVowel(sb.charAt(0)) && isVowel(sb.charAt(1))) 3
        else {
          var j = 1
          while (j < n && !isVowel(sb.charAt(j))) j += 1
          if (j < n) j + 1 else n
        }
      }
      val r1 = regionAfterVC(sb, 0, isVowel)
      val r2 = regionAfterVC(sb, r1, isVowel)

      def endsWith(suf: String): Boolean =
        sb.length >= suf.length && sb.substring(sb.length - suf.length) == suf
      def inRegion(suf: String, r: Int): Boolean = sb.length - suf.length >= r
      def del(n: Int): Unit = sb.setLength(sb.length - n)

      val original = sb.toString
      var step1Changed = false
      var mentFound = false
      var doStep2 = false

      // ---- Step 1: standard suffix removal (longest match, one action)
      val all1 = (Step1Simple ++ Step1Ateur ++ Seq("logies", "logie",
        "usions", "utions", "usion", "ution", "ences", "ence", "ements",
        "ement", "ités", "ité", "ives", "ifs", "ive", "if", "eaux", "aux",
        "euses", "euse", "issements", "issement", "amment", "emment",
        "ments", "ment")).sortBy(-_.length)
      all1.find(endsWith) match {
        case Some(suf) if Step1Simple.contains(suf) =>
          if (inRegion(suf, r2)) { del(suf.length); step1Changed = true }
        case Some(suf) if Step1Ateur.contains(suf) =>
          if (inRegion(suf, r2)) {
            del(suf.length); step1Changed = true
            if (sb.endsWith("ic")) {
              if (inRegion("ic", r2)) del(2)
              else { del(2); sb.append("iqU") }
            }
          }
        case Some(suf @ ("logies" | "logie")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("log"); step1Changed = true }
        case Some(suf @ ("usions" | "utions" | "usion" | "ution")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("u"); step1Changed = true }
        case Some(suf @ ("ences" | "ence")) =>
          if (inRegion(suf, r2)) { del(suf.length); sb.append("ent"); step1Changed = true }
        case Some(suf @ ("ements" | "ement")) =>
          if (inRegion(suf, rv)) {
            del(suf.length); step1Changed = true
            if (sb.endsWith("iv") && inRegion("iv", r2)) {
              del(2)
              if (sb.endsWith("at") && inRegion("at", r2)) del(2)
            } else if (sb.endsWith("eus")) {
              if (inRegion("eus", r2)) del(3)
              else if (inRegion("eus", r1)) { del(1); sb.append("x") }
            } else if ((sb.endsWith("abl") && inRegion("abl", r2)) ||
                       (sb.endsWith("iqU") && inRegion("iqU", r2))) {
              del(3)
            } else if ((sb.endsWith("ièr") && inRegion("ièr", rv)) ||
                       (sb.endsWith("Ièr") && inRegion("Ièr", rv))) {
              del(3); sb.append("i")
            }
          }
        case Some(suf @ ("ités" | "ité")) =>
          if (inRegion(suf, r2)) {
            del(suf.length); step1Changed = true
            if (sb.endsWith("abil")) {
              if (inRegion("abil", r2)) del(4)
              else { del(4); sb.append("abl") }
            } else if (sb.endsWith("ic")) {
              if (inRegion("ic", r2)) del(2)
              else { del(2); sb.append("iqU") }
            } else if (sb.endsWith("iv") && inRegion("iv", r2)) del(2)
          }
        case Some(suf @ ("ives" | "ive" | "ifs" | "if")) =>
          if (inRegion(suf, r2)) {
            del(suf.length); step1Changed = true
            if (sb.endsWith("at") && inRegion("at", r2)) {
              del(2)
              if (sb.endsWith("ic")) {
                if (inRegion("ic", r2)) del(2)
                else { del(2); sb.append("iqU") }
              }
            }
          }
        case Some("eaux") =>
          del(1); step1Changed = true                      // eaux -> eau
        case Some("aux") =>
          if (inRegion("aux", r1)) { del(2); sb.append("l"); step1Changed = true }
        case Some(suf @ ("euses" | "euse")) =>
          if (inRegion(suf, r2)) { del(suf.length); step1Changed = true }
          else if (inRegion(suf, r1)) {
            del(suf.length); sb.append("eux"); step1Changed = true
          }
        case Some(suf @ ("issements" | "issement")) =>
          if (inRegion(suf, r1) && sb.length - suf.length >= 1 &&
              !isVowel(sb.charAt(sb.length - suf.length - 1))) {
            del(suf.length); step1Changed = true
          }
        case Some("amment") =>
          if (inRegion("amment", rv)) { del(6); sb.append("ant"); mentFound = true }
        case Some("emment") =>
          if (inRegion("emment", rv)) { del(6); sb.append("ent"); mentFound = true }
        case Some(suf @ ("ments" | "ment")) =>
          // delete if preceded by a vowel in RV
          if (sb.length - suf.length >= 1 &&
              isVowel(sb.charAt(sb.length - suf.length - 1)) &&
              sb.length - suf.length - 1 >= rv) {
            del(suf.length); mentFound = true
          }
        case None =>
      }

      doStep2 = !step1Changed || mentFound
      var step2Changed = false

      if (doStep2) {
        // Steps 2a/2b are `setlimit tomark pV`: the suffix search itself is
        // confined to RV (a shorter suffix inside RV matches even when a
        // longer one starts before RV).
        var removed2a = false
        Step2a.sortBy(-_.length)
          .find(s => endsWith(s) && inRegion(s, rv)) match {
          case Some(suf) =>
            val pre = sb.length - suf.length - 1
            if (pre >= rv && pre >= 0 && !isVowel(sb.charAt(pre))) {
              del(suf.length); removed2a = true; step2Changed = true
            }
          case None =>
        }
        if (!removed2a) {
          // ---- Step 2b: other verb suffixes (all within RV)
          (Step2bIons ++ Step2bEr ++ Step2bA).sortBy(-_.length).find(s =>
            endsWith(s) && inRegion(s, rv)) match {
            case Some("ions") =>
              if (inRegion("ions", r2)) { del(4); step2Changed = true }
            case Some(suf) if Step2bEr.contains(suf) =>
              del(suf.length); step2Changed = true
            case Some(suf) if Step2bA.contains(suf) =>
              del(suf.length); step2Changed = true
              if (sb.endsWith("e") && sb.length - 1 >= rv) del(1)
            case _ =>
          }
        }
      }

      if (step1Changed || step2Changed) {
        // ---- Step 3
        if (sb.nonEmpty && sb.charAt(sb.length - 1) == 'Y') sb.setCharAt(sb.length - 1, 'i')
        else if (sb.nonEmpty && sb.charAt(sb.length - 1) == 'ç') sb.setCharAt(sb.length - 1, 'c')
      } else {
        // ---- Step 4: residual suffix
        if (sb.nonEmpty && sb.charAt(sb.length - 1) == 's') {
          val pre = if (sb.length >= 2) sb.charAt(sb.length - 2) else ' '
          if ("aiouès".indexOf(pre) < 0) del(1)
        }
        // the residual among is `setlimit tomark pV` too
        Seq("ière", "Ière", "ion", "ier", "Ier", "e", "ë")
          .find(s => endsWith(s) && inRegion(s, rv)) match {
          case Some("ion") =>
            if (inRegion("ion", r2) && sb.length - 4 >= 0 &&
                (sb.charAt(sb.length - 4) == 's' || sb.charAt(sb.length - 4) == 't') &&
                sb.length - 4 >= rv) {
              del(3)
            }
          case Some(suf @ ("ière" | "Ière" | "ier" | "Ier")) =>
            del(suf.length); sb.append("i")
          case Some("e") =>
            del(1)
          case Some("ë") =>
            if (sb.length >= 3 && sb.substring(sb.length - 3, sb.length - 1) == "gu") del(1)
          case _ =>
        }
      }

      // ---- Step 5: undouble
      for (end <- Seq("enn", "onn", "ett", "ell", "eill"))
        if (endsWith(end) && sb.endsWith(end)) del(1)

      // ---- Step 6: un-accent a final é/è followed only by non-vowels
      var j = sb.length - 1
      var sawNonVowel = false
      var break = false
      while (j >= 0 && !break) {
        val c = sb.charAt(j)
        if (!isVowel(c)) { sawNonVowel = true; j -= 1 }
        else {
          if ((c == 'é' || c == 'è') && sawNonVowel) sb.setCharAt(j, 'e')
          break = true
        }
      }

      // postlude
      i = 0
      while (i < sb.length) {
        sb.charAt(i) match {
          case 'U' => sb.setCharAt(i, 'u')
          case 'I' => sb.setCharAt(i, 'i')
          case 'Y' => sb.setCharAt(i, 'y')
          case _ =>
        }
        i += 1
      }
      val out = sb.toString
      if (out.isEmpty) original else out
    }
  }

  // --------------------------------------------------------------- Turkish

  /** Snowball Turkish stemming algorithm (the suffix-stripping automaton the
    * reference wires via lucene/analysis/common/src/java/org/tartarus/
    * snowball/ext/TurkishStemmer.java). Re-derived from the published
    * algorithm; validated word-for-word against the official test
    * vocabulary (96k pairs, SnowballVocabSpec).
    *
    * Turkish is agglutinative: the algorithm strips a nominal-verb
    * (copula) suffix chain, then a noun-case/possessive chain with a
    * recursive branch for the relative suffix -ki, then devoices a final
    * b/c/d/ğ and restores the vowel of a truncated -dU/-dUk suffix.
    * Three decoded conventions matter for vocabulary-exactness:
    *
    *  - suffix matching runs right-to-left, and every save/restore of the
    *    match position is relative to the string END, so a restore across
    *    a deletion lands shifted by the deleted width;
    *  - deletions applied by a failing sub-path persist (only the cursor
    *    is restored, never the string);
    *  - the bare plural branch of the nominal-verb pass stops the whole
    *    algorithm: the noun pass AND the final devoicing/vowel-restore
    *    post-processing are skipped (continue_stemming flag), and the
    *    post-processing is also skipped entirely for the reserved words
    *    "ad" and "soyad".
    *
    * Suffixes with an optional joining consonant (n/s/y) accept the
    * consonant only between two vowels: if the char before the match
    * position is that consonant it must be preceded by a vowel (and is
    * consumed); any other char must be preceded by a vowel one further
    * back. The optional-U-vowel variant (possessives) is the mirror
    * image: the U vowel (ı/i/u/ü) must be preceded by a NON-vowel.
    *
    * Vowel harmony is checked existentially: the last vowel of the
    * remaining window must be preceded somewhere by a vowel of its
    * harmony class (a→aouı, e→iöü+e, ı→aı, i→ei, o/u→ou, ö/ü→öü).
    */
  object Turkish {
    private def isVowel(c: Char): Boolean = "aeıioöuü".indexOf(c) >= 0
    private def isU(c: Char): Boolean = c == 'ı' || c == 'i' || c == 'u' || c == 'ü'

    private def harmonyClass(v: Char): String = v match {
      case 'a'       => "aouı"
      case 'e'       => "eiöü"
      case 'ı'       => "aı"
      case 'i'       => "ei"
      case 'o' | 'u' => "ou"
      case _         => "öü" // ö, ü
    }

    /** Backward-mode matcher over a mutable buffer. `cursor` is absolute
      * (0..sb.length, suffix matching consumes leftward); saves are
      * end-relative offsets so they stay meaningful across deletions,
      * which only ever remove text at/right of the cursor. */
    private final class M(val sb: StringBuilder) {
      var cursor: Int = sb.length
      var ket: Int = sb.length // right end of the candidate slice
      var bra: Int = sb.length // left end

      def save: Int = sb.length - cursor
      def restore(v: Int): Unit = cursor = sb.length - v
      def markKet(): Unit = ket = cursor
      def markBra(): Unit = bra = cursor
      def delete(): Unit = { sb.delete(bra, ket): Unit }
      def replace(s: String): Unit = { sb.replace(bra, ket, s): Unit }

      def eqS(s: String): Boolean = {
        val n = s.length
        if (cursor < n) return false
        var i = 0
        while (i < n) {
          if (sb.charAt(cursor - n + i) != s.charAt(i)) return false
          i += 1
        }
        cursor -= n; true
      }
      def inU(): Boolean =
        if (cursor > 0 && isU(sb.charAt(cursor - 1))) { cursor -= 1; true } else false
      /** backward `goto`: stop with a matching char just before the cursor. */
      def gotoIn(pred: Char => Boolean): Boolean = {
        while (cursor > 0) {
          if (pred(sb.charAt(cursor - 1))) return true
          cursor -= 1
        }
        false
      }
      /** longest-match suffix table (entries pre-sorted longest first). */
      def among(sufs: Array[String]): Boolean = {
        var i = 0
        while (i < sufs.length) {
          val s = sufs(i)
          val n = s.length
          if (cursor >= n) {
            var j = 0
            while (j < n && sb.charAt(cursor - n + j) == s.charAt(j)) j += 1
            if (j == n) { cursor -= n; return true }
          }
          i += 1
        }
        false
      }
    }

    /** Snowball `or`: alternatives left to right, cursor restored before each. */
    private def or(m: M)(alts: (M => Boolean)*): Boolean = {
      val v = m.save
      alts.exists { a => m.restore(v); a(m) }
    }

    /** Snowball `try`: run the body, restore the cursor if it fails. */
    private def attempt(m: M)(body: M => Boolean): Unit = {
      val v = m.save
      if (!body(m)) m.restore(v)
    }

    private def checkVowelHarmony(m: M): Boolean = {
      val v0 = m.save
      val ok =
        if (!m.gotoIn(isVowel)) false
        else {
          val cls = harmonyClass(m.sb.charAt(m.cursor - 1))
          m.cursor -= 1
          m.gotoIn(c => cls.indexOf(c) >= 0)
        }
      m.restore(v0)
      ok
    }

    /** Optional joining consonant `ch` before the match position. */
    private def optCons(m: M, ch: Char): Boolean = {
      val c = m.cursor
      if (c >= 1 && m.sb.charAt(c - 1) == ch) {
        if (c >= 2 && isVowel(m.sb.charAt(c - 2))) { m.cursor = c - 1; true } else false
      } else c >= 2 && isVowel(m.sb.charAt(c - 2))
    }

    /** Optional possessive U vowel (must follow a non-vowel). */
    private def optU(m: M): Boolean = {
      val c = m.cursor
      if (c >= 1 && isU(m.sb.charAt(c - 1))) {
        if (c >= 2 && !isVowel(m.sb.charAt(c - 2))) { m.cursor = c - 1; true } else false
      } else c >= 2 && !isVowel(m.sb.charAt(c - 2))
    }

    // ---- suffix recognizers (cursor moves on success; callers restore on fail)

    private val PossT = Array("miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız", "m", "n")
    private val YDUT = Array(
      "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
      "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
      "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
      "di", "ti", "du", "tu", "dü", "tü", "dı", "tı")

    private def possessives(m: M) = m.among(PossT) && optU(m)
    private def sU(m: M)    = checkVowelHarmony(m) && m.inU() && optCons(m, 's')
    private def lArI(m: M)  = m.among(Array("leri", "ları"))
    private def yU(m: M)    = checkVowelHarmony(m) && m.inU() && optCons(m, 'y')
    private def nU(m: M)    = checkVowelHarmony(m) && m.among(Array("ni", "nu", "nü", "nı"))
    private def nUn(m: M)   = checkVowelHarmony(m) && m.among(Array("in", "un", "ün", "ın")) && optCons(m, 'n')
    private def yA(m: M)    = checkVowelHarmony(m) && m.among(Array("a", "e")) && optCons(m, 'y')
    private def nA(m: M)    = checkVowelHarmony(m) && m.among(Array("na", "ne"))
    private def dA(m: M)    = checkVowelHarmony(m) && m.among(Array("da", "ta", "de", "te"))
    private def ndA(m: M)   = checkVowelHarmony(m) && m.among(Array("nda", "nde"))
    private def dAn(m: M)   = checkVowelHarmony(m) && m.among(Array("dan", "tan", "den", "ten"))
    private def ndAn(m: M)  = checkVowelHarmony(m) && m.among(Array("ndan", "nden"))
    private def ylA(m: M)   = checkVowelHarmony(m) && m.among(Array("la", "le")) && optCons(m, 'y')
    private def ki(m: M)    = m.eqS("ki")
    private def ncA(m: M)   = checkVowelHarmony(m) && m.among(Array("ca", "ce")) && optCons(m, 'n')
    private def yUm(m: M)   = checkVowelHarmony(m) && m.among(Array("im", "um", "üm", "ım")) && optCons(m, 'y')
    private def sUn(m: M)   = checkVowelHarmony(m) && m.among(Array("sin", "sun", "sün", "sın"))
    private def yUz(m: M)   = checkVowelHarmony(m) && m.among(Array("iz", "uz", "üz", "ız")) && optCons(m, 'y')
    private def sUnUz(m: M) = m.among(Array("siniz", "sunuz", "sünüz", "sınız"))
    private def lAr(m: M)   = checkVowelHarmony(m) && m.among(Array("lar", "ler"))
    private def nUz(m: M)   = checkVowelHarmony(m) && m.among(Array("niz", "nuz", "nüz", "nız"))
    private def dUr(m: M)   = checkVowelHarmony(m) && m.among(Array("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))
    private def cAsInA(m: M) = m.among(Array("casına", "cesine"))
    private def yDU(m: M)   = checkVowelHarmony(m) && m.among(YDUT) && optCons(m, 'y')
    private def ysA(m: M)   = m.among(Array("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")) && optCons(m, 'y')
    private def ymUs(m: M)  = checkVowelHarmony(m) && m.among(Array("miş", "muş", "müş", "mış")) && optCons(m, 'y')
    private def yken(m: M)  = m.eqS("ken") && optCons(m, 'y')

    /** Copula / nominal-verb pass. Returns false when the algorithm must
      * stop before the noun pass (the bare -lAr branch); the routine's own
      * match success is irrelevant to the caller (do-semantics). */
    private def stemNominalVerbSuffixes(m: M): Boolean = {
      m.markKet()
      var continueNoun = true
      val v1 = m.save
      var matched = false

      // (ymUş | ydU | ysA | yken): a copula attached directly
      if (or(m)(ymUs, yDU, ysA, yken)) matched = true

      // cAsInA (sUnUz|lAr|yUm|sUn|yUz)? ymUş
      if (!matched) {
        m.restore(v1)
        if (cAsInA(m)) {
          val v3 = m.save
          if (!or(m)(sUnUz, lAr, yUm, sUn, yUz)) m.restore(v3)
          if (ymUs(m)) matched = true
        }
      }

      // lAr (dUr|ydU|ysA|ymUş)? — and stop all further stemming
      if (!matched) {
        m.restore(v1)
        if (lAr(m)) {
          m.markBra(); m.delete()
          val v4 = m.save
          m.markKet()
          if (!or(m)(dUr, yDU, ysA, ymUs)) m.restore(v4)
          continueNoun = false
          matched = true
        }
      }

      // nUz (ydU|ysA)
      if (!matched) {
        m.restore(v1)
        if (nUz(m) && or(m)(yDU, ysA)) matched = true
      }

      // (sUnUz|yUz|sUn|yUm) ymUş?
      if (!matched) {
        m.restore(v1)
        if (or(m)(sUnUz, yUz, sUn, yUm)) {
          m.markBra(); m.delete()
          val v8 = m.save
          m.markKet()
          if (!ymUs(m)) m.restore(v8)
          matched = true
        }
      }

      // dUr ((sUnUz|lAr|yUm|sUn|yUz)? ymUş)?
      if (!matched) {
        m.restore(v1)
        if (dUr(m)) {
          m.markBra(); m.delete()
          val v9 = m.save
          m.markKet()
          val inner = {
            val v10 = m.save
            if (!or(m)(sUnUz, lAr, yUm, sUn, yUz)) m.restore(v10)
            ymUs(m)
          }
          if (!inner) m.restore(v9)
          matched = true
        }
      }

      if (matched) { m.markBra(); m.delete() }
      continueNoun
    }

    /** The recursive -ki branch: ki after a locative/genitive chain. */
    private def stemChainKi(m: M): Boolean = {
      m.markKet()
      if (!ki(m)) return false
      val v1 = m.save

      // -dAki
      if (dA(m)) {
        m.markBra(); m.delete()
        val v2 = m.save
        val sub = {
          m.markKet()
          val v3 = m.save
          val a1 =
            if (lAr(m)) { m.markBra(); m.delete(); attempt(m)(stemChainKi); true } else false
          if (a1) true
          else {
            m.restore(v3)
            if (possessives(m)) {
              m.markBra(); m.delete()
              val v5 = m.save
              val t = {
                m.markKet()
                if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
              }
              if (!t) m.restore(v5)
              true
            } else false
          }
        }
        if (!sub) m.restore(v2)
        return true
      }

      // -nUnki
      m.restore(v1)
      if (nUn(m)) {
        m.markBra(); m.delete()
        val v6 = m.save
        val sub = {
          m.markKet()
          val v7 = m.save
          if (lArI(m)) { m.markBra(); m.delete(); true }
          else {
            m.restore(v7)
            val a2 = {
              m.markKet()
              if (or(m)(possessives, sU)) {
                m.markBra(); m.delete()
                val v9 = m.save
                val t = {
                  m.markKet()
                  if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
                }
                if (!t) m.restore(v9)
                true
              } else false
            }
            if (a2) true
            else { m.restore(v7); stemChainKi(m) }
          }
        }
        if (!sub) m.restore(v6)
        return true
      }

      // -ndAki
      m.restore(v1)
      if (ndA(m)) {
        val v10 = m.save
        if (lArI(m)) { m.markBra(); m.delete(); return true }
        m.restore(v10)
        if (sU(m)) {
          m.markBra(); m.delete()
          val v11 = m.save
          val t = {
            m.markKet()
            if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
          }
          if (!t) m.restore(v11)
          return true
        }
        m.restore(v10)
        return stemChainKi(m)
      }
      false
    }

    /** Noun case/possessive pass: first matching branch wins. */
    private def stemNounSuffixes(m: M): Boolean = {
      val v1 = m.save

      // lAr (ki-chain)?
      m.markKet()
      if (lAr(m)) {
        m.markBra(); m.delete()
        attempt(m)(stemChainKi)
        return true
      }

      // ncA (lArI | (poss|sU)(lAr ki-chain)? | lAr ki-chain)?
      m.restore(v1)
      m.markKet()
      if (ncA(m)) {
        m.markBra(); m.delete()
        val v3 = m.save
        val sub = {
          val v4 = m.save
          val a1 = { m.markKet(); if (lArI(m)) { m.markBra(); m.delete(); true } else false }
          if (a1) true
          else {
            m.restore(v4)
            val a2 = {
              m.markKet()
              if (or(m)(possessives, sU)) {
                m.markBra(); m.delete()
                val v6 = m.save
                val t = {
                  m.markKet()
                  if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
                }
                if (!t) m.restore(v6)
                true
              } else false
            }
            if (a2) true
            else {
              m.restore(v4)
              m.markKet()
              if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
            }
          }
        }
        if (!sub) m.restore(v3)
        return true
      }

      // (ndA|nA) (lArI | sU (lAr ki-chain)? | ki-chain) — all-required
      m.restore(v1)
      m.markKet()
      if (or(m)(ndA, nA)) {
        val v8 = m.save
        val sub =
          if (lArI(m)) { m.markBra(); m.delete(); true }
          else {
            m.restore(v8)
            if (sU(m)) {
              m.markBra(); m.delete()
              val v9 = m.save
              val t = {
                m.markKet()
                if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
              }
              if (!t) m.restore(v9)
              true
            } else { m.restore(v8); stemChainKi(m) }
          }
        if (sub) return true
      }

      // (ndAn|nU) (sU (lAr ki-chain)? | lArI-with-no-deletion)
      m.restore(v1)
      m.markKet()
      if (or(m)(ndAn, nU)) {
        val v11 = m.save
        val sub =
          if (sU(m)) {
            m.markBra(); m.delete()
            val v12 = m.save
            val t = {
              m.markKet()
              if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
            }
            if (!t) m.restore(v12)
            true
          } else {
            // decoded quirk: the lArI alternative matches WITHOUT deleting,
            // consuming the branch so no later branch runs
            m.restore(v11); lArI(m)
          }
        if (sub) return true
      }

      // dAn (poss (lAr ki-chain)? | lAr ki-chain? | ki-chain)?
      m.restore(v1)
      m.markKet()
      if (dAn(m)) {
        m.markBra(); m.delete()
        val v13 = m.save
        val sub = {
          m.markKet()
          val v14 = m.save
          val a1 =
            if (possessives(m)) {
              m.markBra(); m.delete()
              val v15 = m.save
              val t = {
                m.markKet()
                if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
              }
              if (!t) m.restore(v15)
              true
            } else false
          if (a1) true
          else {
            m.restore(v14)
            val a2 =
              if (lAr(m)) { m.markBra(); m.delete(); attempt(m)(stemChainKi); true } else false
            if (a2) true
            else { m.restore(v14); stemChainKi(m) }
          }
        }
        if (!sub) m.restore(v13)
        return true
      }

      // (nUn|ylA) (lAr ki-chain | (poss|sU)(lAr ki-chain)? | ki-chain)?
      m.restore(v1)
      m.markKet()
      if (or(m)(nUn, ylA)) {
        m.markBra(); m.delete()
        val v18 = m.save
        val sub = {
          val v19 = m.save
          val a1 = {
            m.markKet()
            if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
          }
          if (a1) true
          else {
            m.restore(v19)
            val a2 = {
              m.markKet()
              if (or(m)(possessives, sU)) {
                m.markBra(); m.delete()
                val v21 = m.save
                val t = {
                  m.markKet()
                  if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
                }
                if (!t) m.restore(v21)
                true
              } else false
            }
            if (a2) true
            else { m.restore(v19); stemChainKi(m) }
          }
        }
        if (!sub) m.restore(v18)
        return true
      }

      // lArI
      m.restore(v1)
      m.markKet()
      if (lArI(m)) { m.markBra(); m.delete(); return true }

      // bare ki-chain
      m.restore(v1)
      if (stemChainKi(m)) return true

      // (dA|yU|yA) ((poss lAr? | lAr) ki-chain)?
      m.restore(v1)
      m.markKet()
      if (or(m)(dA, yU, yA)) {
        m.markBra(); m.delete()
        val v23 = m.save
        val sub = {
          m.markKet()
          val v24 = m.save
          val got = {
            val a1 =
              if (possessives(m)) {
                m.markBra(); m.delete()
                val v25 = m.save
                val t = { m.markKet(); lAr(m) }
                if (!t) m.restore(v25)
                true
              } else false
            if (a1) true
            else { m.restore(v24); lAr(m) }
          }
          if (got) {
            m.markBra(); m.delete()
            m.markKet()
            stemChainKi(m)
          } else false
        }
        if (!sub) m.restore(v23)
        return true
      }

      // (poss|sU) (lAr ki-chain)? — final mandatory branch
      m.restore(v1)
      m.markKet()
      if (or(m)(possessives, sU)) {
        m.markBra(); m.delete()
        val v27 = m.save
        val t = {
          m.markKet()
          if (lAr(m)) { m.markBra(); m.delete(); stemChainKi(m) } else false
        }
        if (!t) m.restore(v27)
        true
      } else false
    }

    /** Devoice a final b/c/d/ğ to p/ç/t/k. */
    private def postProcessLastConsonants(m: M): Boolean = {
      m.markKet()
      if (m.eqS("b")) { m.markBra(); m.replace("p"); true }
      else if (m.eqS("c")) { m.markBra(); m.replace("ç"); true }
      else if (m.eqS("d")) { m.markBra(); m.replace("t"); true }
      else if (m.eqS("ğ")) { m.markBra(); m.replace("k"); true }
      else false
    }

    /** A stem left ending in d/g lost the U vowel of a -dU/-dUk suffix:
      * append the harmony-matching U (keyed on the last remaining vowel). */
    private def appendUToStemsEndingWithDOrG(m: M): Boolean = {
      val c = m.cursor
      if (c < 1) return false
      val last = m.sb.charAt(c - 1)
      if (last != 'd' && last != 'g') return false
      var i = c - 1
      while (i >= 0 && !isVowel(m.sb.charAt(i))) i -= 1
      if (i < 0) return false
      m.sb.charAt(i) match {
        case 'a' | 'ı' => m.sb.append('ı'); true
        case 'e' | 'i' => m.sb.append('i'); true
        case 'o' | 'u' => m.sb.append('u'); true
        case 'ö' | 'ü' => m.sb.append('ü'); true
        case _         => false
      }
    }

    def stem(word: String): String = {
      // words with fewer than two vowels are left untouched
      var vc = 0
      var i = 0
      while (i < word.length) { if (isVowel(word.charAt(i))) vc += 1; i += 1 }
      if (vc < 2) return word

      val m = new M(new StringBuilder(word))
      val continueNoun = stemNominalVerbSuffixes(m) // deletions persist either way
      if (!continueNoun) return m.sb.toString       // bare -lAr: stop before noun pass and postlude
      m.cursor = m.sb.length
      stemNounSuffixes(m): Unit

      // postlude — skipped entirely for the reserved words
      val s = m.sb.toString
      if (s == "ad" || s == "soyad") return s
      m.cursor = m.sb.length
      appendUToStemsEndingWithDOrG(m): Unit
      m.cursor = m.sb.length
      postProcessLastConsonants(m): Unit
      m.sb.toString
    }
  }

  // ---------------------------------------------------------------- Arabic

  /** Snowball Arabic stemming algorithm (Assem Chelli's light stemmer; the
    * reference wires its generated form via lucene/analysis/common/src/
    * java/org/tartarus/snowball/ext/ArabicStemmer.java). Re-derived from
    * the published algorithm; validated word-for-word against the official
    * test vocabulary (SnowballVocabSpec).
    *
    * Shape: a pre-normalization pass (strip tatweel and harakat, map
    * Arabic-Indic digits to ASCII, fold the U+FE80..U+FEFC presentation
    * forms to base letters — the lam-alef ligatures expand to two
    * letters), a prefix classification that flags definite nouns, a
    * backward suffix pass (verb pronoun/person chains, noun
    * pronoun/plural/feminine chains, alef-maqsura fold), a forward prefix
    * pass (hamza normalization, conjunction fa/waw, definite articles,
    * verb futurity seen-forms), and a post-normalization (final hamza
    * deconstruction, hamza carriers folded to bare alef/waw/yeh).
    *
    * Every suffix/prefix rule is gated on the word length AT ROUTINE
    * ENTRY, and the cursor carries between steps (a verb/noun chain's
    * optional bare `next` can leave the cursor one letter inside the
    * word, making a later deletion mid-string) — both decoded semantics
    * are preserved.
    */
  object Arabic {
    // base-form letters
    private val Hamza      = "ء" // ء
    private val Madda      = "آ" // آ
    private val AHamza     = "أ" // أ
    private val WHamza     = "ؤ" // ؤ
    private val IHamza     = "إ" // إ
    private val YHamza     = "ئ" // ئ
    private val Alef       = "ا" // ا
    private val Beh        = "ب" // ب
    private val TehMarbuta = "ة" // ة
    private val Teh        = "ت" // ت
    private val Seen       = "س" // س
    private val Feh        = "ف" // ف
    private val Kaf        = "ك" // ك
    private val Lam        = "ل" // ل
    private val Meem       = "م" // م
    private val Noon       = "ن" // ن
    private val Heh        = "ه" // ه
    private val Waw        = "و" // و
    private val Maqsura    = "ى" // ى
    private val Yeh        = "ي" // ي

    /** U+FE80..U+FEFC presentation forms → base letters, run-length
      * encoded in code-point order (count, replacement). */
    private val PresentationForms: Array[String] = {
      val runs = Seq(
        1 -> Hamza, 2 -> Madda, 2 -> AHamza, 2 -> WHamza, 2 -> IHamza,
        4 -> YHamza, 2 -> Alef, 4 -> Beh, 2 -> TehMarbuta, 4 -> Teh,
        4 -> "ث", 4 -> "ج", 4 -> "ح", 4 -> "خ",
        2 -> "د", 2 -> "ذ", 2 -> "ر", 2 -> "ز",
        4 -> Seen, 4 -> "ش", 4 -> "ص", 4 -> "ض",
        4 -> "ط", 4 -> "ظ", 4 -> "ع", 4 -> "غ",
        4 -> Feh, 4 -> "ق", 4 -> Kaf, 4 -> Lam, 4 -> Meem,
        4 -> Noon, 4 -> Heh, 2 -> Waw, 2 -> Maqsura, 4 -> Yeh,
        2 -> (Lam + Madda), 2 -> (Lam + AHamza), 2 -> (Lam + IHamza),
        2 -> (Lam + Alef))
      runs.flatMap { case (n, rep) => Seq.fill(n)(rep) }.toArray
    }

    // suffix tables: (suffix, rule id), longest first; prefix tables likewise
    private val VerbS1 = Array(
      Kaf + Meem + Alef -> 3, Heh + Meem + Alef -> 3, Kaf + Meem + Waw -> 3,
      Noon + Alef -> 2, Heh + Alef -> 2, Kaf + Meem -> 2, Heh + Meem -> 2,
      Kaf + Noon -> 2, Heh + Noon -> 2, Noon + Yeh -> 2, Kaf -> 1, Heh -> 1)
    private val VerbS2a = Array(
      Teh + Meem + Alef -> 5, Teh + Alef -> 3, Noon + Alef -> 3,
      Teh + Noon -> 3, Alef + Noon -> 4, Waw + Noon -> 4, Yeh + Noon -> 4,
      Alef -> 2, Noon -> 2, Yeh -> 2, Teh -> 1)
    private val VerbS2b = Array(Waw + Alef -> 1, Teh + Meem -> 1)
    private val VerbS2c = Array(Teh + Meem + Waw -> 2, Waw -> 1)
    private val NounS1a = Array(
      Kaf + Meem + Alef -> 3, Heh + Meem + Alef -> 3,
      Noon + Alef -> 2, Heh + Alef -> 2, Kaf + Meem -> 2, Heh + Meem -> 2,
      Heh + Noon -> 2, Kaf -> 1, Heh -> 1, Yeh -> 1)

    private final class M(val sb: StringBuilder) {
      var cursor = 0
      var bra = 0
      var ket = 0
      var isNoun = true
      var isVerb = true
      var isDefined = false

      def saveB: Int = sb.length - cursor
      def restoreB(v: Int): Unit = cursor = sb.length - v
      def replaceSlice(s: String): Unit = {
        val adj = s.length - (ket - bra)
        sb.replace(bra, ket, s): Unit
        if (cursor >= ket) cursor += adj else if (cursor > bra) cursor = bra
      }
      def delSlice(): Unit = replaceSlice("")

      def startsHere(s: String): Boolean = {
        val n = s.length
        if (cursor + n > sb.length) return false
        var i = 0
        while (i < n) { if (sb.charAt(cursor + i) != s.charAt(i)) return false; i += 1 }
        true
      }
      def amongF(entries: Array[(String, Int)]): Int = {
        var i = 0
        while (i < entries.length) {
          val (s, id) = entries(i)
          if (startsHere(s)) { cursor += s.length; return id }
          i += 1
        }
        0
      }
      def endsHere(s: String): Boolean = {
        val n = s.length
        if (cursor < n) return false
        var i = 0
        while (i < n) { if (sb.charAt(cursor - n + i) != s.charAt(i)) return false; i += 1 }
        true
      }
      def amongB(entries: Array[(String, Int)]): Int = {
        var i = 0
        while (i < entries.length) {
          val (s, id) = entries(i)
          if (endsHere(s)) { cursor -= s.length; return id }
          i += 1
        }
        0
      }
    }

    /** One backward suffix rule: match the table at the cursor, gate on
      * the entry length, delete the slice. */
    private def sDel(m: M, table: Array[(String, Int)], need: Int => Int): Boolean = {
      val wl = m.sb.length
      m.ket = m.cursor
      val id = m.amongB(table)
      if (id == 0) return false
      m.bra = m.cursor
      if (wl < need(id)) return false
      m.delSlice(); true
    }

    private def sVerbStep1(m: M)    = sDel(m, VerbS1, { case 1 => 4; case 2 => 5; case _ => 6 })
    private def sVerbStep2a(m: M)   = sDel(m, VerbS2a, { case 1 | 2 => 4; case 3 => 5; case _ => 6 })
    private def sVerbStep2b(m: M)   = sDel(m, VerbS2b, _ => 5)
    private def sVerbStep2c(m: M)   = sDel(m, VerbS2c, { case 1 => 4; case _ => 6 })
    private def sNounStep1a(m: M)   = sDel(m, NounS1a, { case 1 => 4; case 2 => 5; case _ => 6 })
    private def sNounStep1b(m: M)   = sDel(m, Array(Noon -> 1), _ => 6)
    private def sNounStep2a(m: M)   = sDel(m, Array(Alef -> 1, Waw -> 1, Yeh -> 1), _ => 5)
    private def sNounStep2b(m: M)   = sDel(m, Array(Alef + Teh -> 1), _ => 5)
    private def sNounStep2c1(m: M)  = sDel(m, Array(Teh -> 1), _ => 4)
    private def sNounStep2c2(m: M)  = sDel(m, Array(TehMarbuta -> 1), _ => 4)
    private def sNounStep3(m: M)    = sDel(m, Array(Yeh -> 1), _ => 3)
    private def sAlefMaqsura(m: M): Boolean = {
      m.ket = m.cursor
      if (m.amongB(Array(Maqsura -> 1)) == 0) return false
      m.bra = m.cursor
      m.replaceSlice(Yeh); true
    }

    // verb suffix chain: (Step1+ (Step2a|Step2c|next)) | Step2b | Step2a
    private def verbSuffixes(m: M): Boolean = {
      val v5 = m.saveB
      val alt1 = {
        var n = 0
        var go = true
        while (go) {
          val v = m.saveB
          if (sVerbStep1(m)) n += 1 else { m.restoreB(v); go = false }
        }
        if (n == 0) false
        else {
          val v8 = m.saveB
          if (sVerbStep2a(m)) true
          else {
            m.restoreB(v8)
            if (sVerbStep2c(m)) true
            else {
              m.restoreB(v8)
              if (m.cursor > 0) { m.cursor -= 1; true } else false
            }
          }
        }
      }
      if (alt1) return true
      m.restoreB(v5)
      if (sVerbStep2b(m)) return true
      m.restoreB(v5)
      sVerbStep2a(m)
    }

    // noun suffix chain: an optional pronoun/plural/feminine group, then
    // the final-yeh strip is REQUIRED for the branch to hold
    private def nounSuffixes(m: M): Boolean = {
      val v9 = m.saveB
      val tried = {
        val v10 = m.saveB
        if (sNounStep2c2(m)) true
        else {
          m.restoreB(v10)
          val alt2 =
            if (m.isDefined) false
            else if (sNounStep1a(m)) {
              val v12 = m.saveB
              if (sNounStep2a(m)) true
              else {
                m.restoreB(v12)
                if (sNounStep2b(m)) true
                else {
                  m.restoreB(v12)
                  if (sNounStep2c1(m)) true
                  else {
                    m.restoreB(v12)
                    if (m.cursor > 0) { m.cursor -= 1; true } else false
                  }
                }
              }
            } else false
          if (alt2) true
          else {
            m.restoreB(v10)
            val alt3 =
              if (sNounStep1b(m)) {
                val v13 = m.saveB
                if (sNounStep2a(m)) true
                else {
                  m.restoreB(v13)
                  if (sNounStep2b(m)) true
                  else { m.restoreB(v13); sNounStep2c1(m) }
                }
              } else false
            if (alt3) true
            else {
              m.restoreB(v10)
              if (!m.isDefined && sNounStep2a(m)) true
              else { m.restoreB(v10); sNounStep2b(m) }
            }
          }
        }
      }
      if (!tried) m.restoreB(v9)
      sNounStep3(m)
    }

    // ---- forward prefix rules (the cursor carries between steps)

    private def checks1(m: M): Boolean = {
      val wl = m.sb.length
      val id = m.amongF(Array(
        Beh + Alef + Lam -> 1, Kaf + Alef + Lam -> 1, Alef + Lam -> 2, Lam + Lam -> 2))
      if (id == 0) return false
      if (wl <= (if (id == 1) 4 else 3)) return false
      m.isNoun = true; m.isVerb = false; m.isDefined = true
      true
    }

    private def prefixStep1(m: M): Boolean = {
      val wl = m.sb.length
      m.bra = m.cursor
      val id = m.amongF(Array(
        AHamza + Madda -> 2, AHamza + AHamza -> 1, AHamza + WHamza -> 3,
        AHamza + IHamza -> 5, AHamza + Alef -> 4))
      if (id == 0) return false
      m.ket = m.cursor
      if (wl <= 3) return false
      id match {
        case 1 | 3 => m.replaceSlice(AHamza)
        case 2     => m.replaceSlice(Madda)
        case 4     => m.replaceSlice(Alef)
        case _     => m.replaceSlice(IHamza)
      }
      true
    }

    private def prefixStep2(m: M): Boolean = {
      val wl = m.sb.length
      if (m.startsHere(Feh + Alef) || m.startsHere(Waw + Alef)) return false
      m.bra = m.cursor
      if (m.amongF(Array(Feh -> 1, Waw -> 1)) == 0) return false
      m.ket = m.cursor
      if (wl <= 3) return false
      m.delSlice(); true
    }

    private def prefixStep3aNoun(m: M): Boolean = {
      val wl = m.sb.length
      m.bra = m.cursor
      val id = m.amongF(Array(
        Beh + Alef + Lam -> 1, Kaf + Alef + Lam -> 1, Alef + Lam -> 2, Lam + Lam -> 2))
      if (id == 0) return false
      m.ket = m.cursor
      if (wl <= (if (id == 1) 5 else 4)) return false
      m.delSlice(); true
    }

    private def prefixStep3bNoun(m: M): Boolean = {
      val wl = m.sb.length
      if (m.startsHere(Beh + Alef)) return false
      m.bra = m.cursor
      val id = m.amongF(Array(Beh + Beh -> 2, Kaf + Kaf -> 3, Beh -> 1))
      if (id == 0) return false
      m.ket = m.cursor
      if (wl <= 3) return false
      id match {
        case 1 => m.delSlice()
        case 2 => m.replaceSlice(Beh)
        case _ => m.replaceSlice(Kaf)
      }
      true
    }

    private def prefixStep3Verb(m: M): Boolean = {
      val wl = m.sb.length
      m.bra = m.cursor
      val id = m.amongF(Array(
        Seen + Yeh -> 1, Seen + Teh -> 2, Seen + Noon -> 3, Seen + AHamza -> 4))
      if (id == 0) return false
      m.ket = m.cursor
      if (wl <= 4) return false
      id match {
        case 1 => m.replaceSlice(Yeh)
        case 2 => m.replaceSlice(Teh)
        case 3 => m.replaceSlice(Noon)
        case _ => m.replaceSlice(AHamza)
      }
      true
    }

    private def prefixStep4Verb(m: M): Boolean = {
      val wl = m.sb.length
      m.bra = m.cursor
      val id = m.amongF(Array(
        Teh + Seen + Teh -> 1, Noon + Seen + Teh -> 1, Yeh + Seen + Teh -> 1))
      if (id == 0) return false
      m.ket = m.cursor
      if (wl <= 4) return false
      m.isVerb = true; m.isNoun = false
      m.replaceSlice(Alef + Seen + Teh)
      true
    }

    private def prefixes(m: M): Unit = {
      val v16 = m.cursor
      if (!prefixStep1(m)) m.cursor = v16
      val v17 = m.cursor
      if (!prefixStep2(m)) m.cursor = v17
      val v18 = m.cursor
      if (!prefixStep3aNoun(m)) {
        m.cursor = v18
        val alt2 = m.isNoun && prefixStep3bNoun(m)
        if (!alt2) {
          m.cursor = v18
          if (!m.isVerb) return
          val v19 = m.cursor
          if (!prefixStep3Verb(m)) m.cursor = v19
          prefixStep4Verb(m): Unit
        }
      }
    }

    /** Strip tatweel and harakat, map Arabic-Indic digits to ASCII, fold
      * presentation forms (lam-alef ligatures expand to two letters). */
    private def normalizePre(sb: StringBuilder): Unit = {
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == 'ـ' || (c >= 'ً' && c <= 'ْ')) sb.deleteCharAt(i): Unit
        else if (c >= '٠' && c <= '٩') {
          sb.setCharAt(i, ('0' + (c - '٠')).toChar); i += 1
        } else if (c >= 'ﺀ' && c <= 'ﻼ') {
          val rep = PresentationForms(c - 0xFE80)
          sb.replace(i, i + 1, rep): Unit
          i += rep.length
        } else i += 1
      }
    }

    /** Deconstruct a final hamza carrier to bare hamza; fold the carriers
      * to alef/waw/yeh everywhere else. */
    private def normalizePost(sb: StringBuilder): Unit = {
      if (sb.nonEmpty) {
        val last = sb.charAt(sb.length - 1)
        if (last == Madda(0) || last == AHamza(0) || last == WHamza(0) ||
            last == IHamza(0) || last == YHamza(0))
          sb.setCharAt(sb.length - 1, Hamza(0))
      }
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == Madda(0) || c == AHamza(0) || c == IHamza(0)) sb.setCharAt(i, Alef(0))
        else if (c == WHamza(0)) sb.setCharAt(i, Waw(0))
        else if (c == YHamza(0)) sb.setCharAt(i, Yeh(0))
        i += 1
      }
    }

    def stem(word: String): String = {
      val sb = new StringBuilder(word)
      val m = new M(sb)
      checks1(m): Unit        // flags only, on the raw word
      m.cursor = 0
      normalizePre(sb)
      // backward suffix block
      m.cursor = sb.length
      val alt1 = m.isVerb && verbSuffixes(m)
      if (!alt1) {
        m.cursor = sb.length
        val alt2 = m.isNoun && nounSuffixes(m)
        if (!alt2) {
          m.cursor = sb.length
          sAlefMaqsura(m): Unit
        }
      }
      // forward prefix block
      m.cursor = 0
      prefixes(m)
      normalizePost(sb)
      sb.toString
    }
  }
}
