package graft.analysis

/**
 * The reference's CLEF "light" / "minimal" stemmer family
 * (lucene/analysis/common/src/java/org/apache/lucene/analysis/
 * {de,fr,es,it,pt,ru,sv,fi,hu,no}/..LightStemmer.java etc.) — the
 * corpus-calibrated suffix strippers published in Jacques Savoy's CLEF
 * monolingual-track reports (and, for German, Leveling's UniNE rules),
 * re-derived here from those published rule sets over an immutable-String
 * surface instead of the reference's mutable char[]/len convention.
 *
 * Every stemmer is validated word-for-word against the reference's own
 * golden vocabularies (the TSVs under src/test/resources/lightstem — ~420k
 * pairs; LightStemVocabSpec), the same evidence pattern as Snowball.
 *
 * All of these run AFTER the tokenizer's lowercasing in [[AnalyzerChain]],
 * matching the reference analyzers' LowerCaseFilter-before-stem ordering.
 */
object LightStemmers {

  @inline private def ends(s: CharSequence, suf: String): Boolean = {
    val n = s.length; val m = suf.length
    if (n < m) return false
    var i = 0
    while (i < m) { if (s.charAt(n - m + i) != suf.charAt(i)) return false; i += 1 }
    true
  }

  /** German light (UniNE): fold umlauts/accented vowels, then two passes of
    * plural/case endings with the st-consonant gate. */
  object GermanLight {
    private def stCons(c: Char): Boolean =
      "bdfghklmnt".indexOf(c) >= 0
    def stem(w: String): String = {
      val b = new StringBuilder(w.length)
      w.foreach {
        case 'ä' | 'à' | 'á' | 'â' => b += 'a'
        case 'ö' | 'ò' | 'ó' | 'ô' => b += 'o'
        case 'ï' | 'ì' | 'í' | 'î' => b += 'i'
        case 'ü' | 'ù' | 'ú' | 'û' => b += 'u'
        case c => b += c
      }
      var s = b.toString
      // pass 1: -ern, -e[mnrs], -e, -s (after one of bdfghklmnt)
      val n1 = s.length
      s = if (n1 > 5 && s.endsWith("ern")) s.dropRight(3)
      else if (n1 > 4 && n1 >= 2 && s.charAt(n1 - 2) == 'e' &&
        "mnrs".indexOf(s.charAt(n1 - 1)) >= 0) s.dropRight(2)
      else if (n1 > 3 && s.last == 'e') s.dropRight(1)
      else if (n1 > 3 && s.last == 's' && stCons(s.charAt(n1 - 2))) s.dropRight(1)
      else s
      // pass 2: -est, -er/-en, -st (after st-consonant)
      val n2 = s.length
      if (n2 > 5 && s.endsWith("est")) s.dropRight(3)
      else if (n2 > 4 && (s.endsWith("er") || s.endsWith("en"))) s.dropRight(2)
      else if (n2 > 4 && s.endsWith("st") && stCons(s.charAt(n2 - 3))) s.dropRight(2)
      else s
    }
  }

  /** German minimal (plural-only). */
  object GermanMinimal {
    def stem(w: String): String = {
      if (w.length < 5) return w
      val s = w.map { case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'; case c => c }
      val n = s.length
      if (n > 6 && s.endsWith("nen")) return s.dropRight(3)
      if (n > 5) {
        val a = s.charAt(n - 2); val z = s.charAt(n - 1)
        if ((z == 'n' && a == 'e') || (z == 'e' && a == 's') ||
            (z == 's' && a == 'e') || (z == 'r' && a == 'e')) return s.dropRight(2)
      }
      if ("nesr".indexOf(s.charAt(n - 1)) >= 0) s.dropRight(1) else s
    }
  }

  /** French light (Savoy): rich derivational rewriting, then the norm()
    * cleanup (accent fold, doubled-letter collapse, -ie/-r/-e strips). */
  object FrenchLight {
    private def norm(in: String): String = {
      var s = in
      if (s.length > 4) {
        val b = new StringBuilder(s.length)
        s.foreach {
          case 'à' | 'á' | 'â' => b += 'a'
          case 'ô' => b += 'o'
          case 'è' | 'é' | 'ê' => b += 'e'
          case 'ù' | 'û' => b += 'u'
          case 'î' => b += 'i'
          case 'ç' => b += 'c'
          case c => b += c
        }
        // collapse every run of an identical letter to one char
        var i = 1
        while (i < b.length) {
          if (b.charAt(i) == b.charAt(i - 1) && Character.isLetter(b.charAt(i)))
            b.deleteCharAt(i)
          else i += 1
        }
        s = b.toString
      }
      if (s.length > 4 && s.endsWith("ie")) s = s.dropRight(2)
      if (s.length > 4) {
        if (s.last == 'r') s = s.dropRight(1)
        if (s.last == 'e') s = s.dropRight(1)
        if (s.last == 'e') s = s.dropRight(1)
        if (s.length >= 2 && s.last == s.charAt(s.length - 2) &&
          Character.isLetter(s.last)) s = s.dropRight(1)
      }
      s
    }

    def stem(w: String): String = {
      var s = w
      if (s.length > 5 && s.last == 'x') {
        if (s.charAt(s.length - 3) == 'a' && s.charAt(s.length - 2) == 'u' &&
            s.charAt(s.length - 4) != 'e')
          s = s.substring(0, s.length - 2) + "lx"
        s = s.dropRight(1)
      }
      if (s.length > 3 && s.last == 'x') s = s.dropRight(1)
      if (s.length > 3 && s.last == 's') s = s.dropRight(1)
      val n = s.length
      if (n > 9 && s.endsWith("issement")) return norm(s.dropRight(6).dropRight(1) + "r")
      if (n > 8 && s.endsWith("issant"))   return norm(s.dropRight(4).dropRight(1) + "r")
      if (n > 6 && s.endsWith("ement")) {
        s = s.dropRight(4)
        if (s.length > 3 && s.endsWith("ive")) s = s.dropRight(2) + "f"
        return norm(s)
      }
      if (n > 11 && s.endsWith("ficatrice")) return norm(s.dropRight(7) + "er")
      if (n > 10 && s.endsWith("ficateur"))  return norm(s.dropRight(6) + "er")
      if (n > 9 && s.endsWith("catrice"))    return norm(s.dropRight(7) + "quer")
      if (n > 8 && s.endsWith("cateur"))     return norm(s.dropRight(6) + "quer")
      if (n > 8 && s.endsWith("atrice"))     return norm(s.dropRight(6) + "er")
      if (n > 7 && s.endsWith("ateur"))      return norm(s.dropRight(5) + "er")
      if (n > 6 && s.endsWith("trice"))      s = s.dropRight(5) + "teur"
      val n2 = s.length
      if (n2 > 5 && s.endsWith("ième"))  return norm(s.dropRight(4))
      if (n2 > 7 && s.endsWith("teuse")) return norm(s.dropRight(3) + "r")
      if (n2 > 6 && s.endsWith("teur"))  return norm(s.dropRight(2) + "r")
      if (n2 > 5 && s.endsWith("euse"))  return norm(s.dropRight(2))
      if (n2 > 8 && s.endsWith("ère"))   return norm(s.dropRight(3) + "er")
      if (n2 > 7 && s.endsWith("ive"))   return norm(s.dropRight(2) + "f")
      if (n2 > 4 && (s.endsWith("folle") || s.endsWith("molle")))
        return norm(s.dropRight(3) + "u")
      if (n2 > 9 && s.endsWith("nnelle")) return norm(s.dropRight(5))
      if (n2 > 9 && s.endsWith("nnel"))   return norm(s.dropRight(3))
      if (n2 > 4 && s.endsWith("ète"))    s = s.dropRight(3) + "et"
      if (s.length > 8 && s.endsWith("ique")) s = s.dropRight(4)
      val n3 = s.length
      if (n3 > 8 && s.endsWith("esse"))    return norm(s.dropRight(3))
      if (n3 > 7 && s.endsWith("inage"))   return norm(s.dropRight(3))
      if (n3 > 9 && s.endsWith("isation")) {
        s = s.dropRight(7)
        if (s.length > 5 && s.endsWith("ual")) s = s.dropRight(2) + "el"
        return norm(s)
      }
      if (n3 > 9 && s.endsWith("isateur")) return norm(s.dropRight(7))
      if (n3 > 8 && s.endsWith("ation"))   return norm(s.dropRight(5))
      if (n3 > 8 && s.endsWith("ition"))   return norm(s.dropRight(5))
      norm(s)
    }
  }

  /** French minimal: plural -x (with -aux→-al) and the -s/-r/-e/-é tail. */
  object FrenchMinimal {
    def stem(w: String): String = {
      if (w.length < 6) return w
      var s = w
      if (s.last == 'x')
        return if (s.endsWith("aux")) s.dropRight(2) + "l" else s.dropRight(1)
      if (s.last == 's') s = s.dropRight(1)
      if (s.last == 'r') s = s.dropRight(1)
      if (s.last == 'e') s = s.dropRight(1)
      if (s.last == 'é') s = s.dropRight(1)
      if (s.length >= 2 && s.last == s.charAt(s.length - 2)) s = s.dropRight(1)
      s
    }
  }

  /** Spanish light (Savoy): gender/number vowel strips with the -ces→-z
    * pluralization reversal. */
  object SpanishLight {
    def stem(w: String): String = {
      if (w.length < 5) return w
      val s = w.map {
        case 'à' | 'á' | 'â' | 'ä' => 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' => 'o'
        case 'è' | 'é' | 'ê' | 'ë' => 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => 'u'
        case 'ì' | 'í' | 'î' | 'ï' => 'i'
        case c => c
      }
      val n = s.length
      s.charAt(n - 1) match {
        case 'o' | 'a' | 'e' => s.dropRight(1)
        case 's' =>
          if (n >= 4 && s.endsWith("eses")) s.dropRight(2)
          else if (s.endsWith("ces")) s.dropRight(3) + "z"
          else if (n >= 2 && "oae".indexOf(s.charAt(n - 2)) >= 0) s.dropRight(2)
          else s
        case _ => s
      }
    }
  }

  /** Italian light (Savoy): final-vowel gender/number strips with the
    * -i/-h plural digraph handling. */
  object ItalianLight {
    def stem(w: String): String = {
      if (w.length < 6) return w
      val s = w.map {
        case 'à' | 'á' | 'â' | 'ä' => 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' => 'o'
        case 'è' | 'é' | 'ê' | 'ë' => 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => 'u'
        case 'ì' | 'í' | 'î' | 'ï' => 'i'
        case c => c
      }
      val n = s.length
      val prev = s.charAt(n - 2)
      s.charAt(n - 1) match {
        case 'e' => if (prev == 'i' || prev == 'h') s.dropRight(2) else s.dropRight(1)
        case 'i' => if (prev == 'h' || prev == 'i') s.dropRight(2) else s.dropRight(1)
        case 'a' => if (prev == 'i') s.dropRight(2) else s.dropRight(1)
        case 'o' => if (prev == 'i') s.dropRight(2) else s.dropRight(1)
        case _ => s
      }
    }
  }

  /** Portuguese light (Savoy): plural reversal (-ões→-ão, -ais→-al, ...),
    * feminine→masculine rewrite, final-vowel strip, accent fold. */
  object PortugueseLight {
    private def removeSuffix(in: String): String = {
      val s = in; val n = s.length
      if (n > 4 && s.endsWith("es") && "rslz".indexOf(s.charAt(n - 3)) >= 0)
        return s.dropRight(2)
      if (n > 3 && s.endsWith("ns")) return s.dropRight(2) + "m"
      if (n > 4 && (s.endsWith("eis") || s.endsWith("éis"))) return s.dropRight(3) + "el"
      if (n > 4 && s.endsWith("ais")) return s.dropRight(2) + "l"
      if (n > 4 && s.endsWith("óis")) return s.dropRight(3) + "ol"
      if (n > 4 && s.endsWith("is"))  return s.dropRight(1) + "l"
      if (n > 3 && (s.endsWith("ões") || s.endsWith("ães"))) return s.dropRight(3) + "ão"
      if (n > 6 && s.endsWith("mente")) return s.dropRight(5)
      if (n > 3 && s.last == 's') return s.dropRight(1)
      s
    }
    private def normFeminine(in: String): String = {
      val s = in; val n = s.length
      if (n > 7 && (s.endsWith("inha") || s.endsWith("iaca") || s.endsWith("eira")))
        return s.dropRight(1) + "o"
      if (n > 6) {
        if (s.endsWith("osa") || s.endsWith("ica") || s.endsWith("ida") ||
            s.endsWith("ada") || s.endsWith("iva") || s.endsWith("ama"))
          return s.dropRight(1) + "o"
        if (s.endsWith("ona")) return s.dropRight(3) + "ão"
        if (s.endsWith("ora")) return s.dropRight(1)
        if (s.endsWith("esa")) return s.dropRight(3) + "ês"
        if (s.endsWith("na"))  return s.dropRight(1) + "o"
      }
      s
    }
    def stem(w: String): String = {
      if (w.length < 4) return w
      var s = removeSuffix(w)
      if (s.length > 3 && s.last == 'a') s = normFeminine(s)
      if (s.length > 4 && "eao".indexOf(s.last) >= 0) s = s.dropRight(1)
      s.map {
        case 'à' | 'á' | 'â' | 'ä' | 'ã' => 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' | 'õ' => 'o'
        case 'è' | 'é' | 'ê' | 'ë' => 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => 'u'
        case 'ì' | 'í' | 'î' | 'ï' => 'i'
        case 'ç' => 'c'
        case c => c
      }
    }
  }

  /** Russian light (Savoy): adjective/case ending removal then the
    * soft-sign / -и / -нн normalization. */
  object RussianLight {
    private val case4 = Seq("иями", "оями")
    private val case3 = Seq("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
      "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
    private val case2 = Seq("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию",
      "ьв", "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий",
      "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
    def stem(w: String): String = {
      var s = w
      val n = s.length
      s = if (n > 6 && case4.exists(s.endsWith)) s.dropRight(4)
      else if (n > 5 && case3.exists(s.endsWith)) s.dropRight(3)
      else if (n > 4 && case2.exists(s.endsWith)) s.dropRight(2)
      else if (n > 3 && "аеиоуйыяь".indexOf(s.last) >= 0) s.dropRight(1)
      else s
      if (s.length > 3) {
        if (s.last == 'ь' || s.last == 'и') s = s.dropRight(1)
        else if (s.endsWith("нн")) s = s.dropRight(1)
      }
      s
    }
  }

  /** Swedish light (Savoy). */
  object SwedishLight {
    def stem(w: String): String = {
      var s = w
      if (s.length > 4 && s.last == 's') s = s.dropRight(1)
      val n = s.length
      if (n > 7 && (s.endsWith("elser") || s.endsWith("heten"))) return s.dropRight(5)
      if (n > 6 && (s.endsWith("arne") || s.endsWith("erna") || s.endsWith("ande") ||
        s.endsWith("else") || s.endsWith("aste") || s.endsWith("orna") ||
        s.endsWith("aren"))) return s.dropRight(4)
      if (n > 5 && (s.endsWith("are") || s.endsWith("ast") || s.endsWith("het")))
        return s.dropRight(3)
      if (n > 4 && (s.endsWith("ar") || s.endsWith("er") || s.endsWith("or") ||
        s.endsWith("en") || s.endsWith("at") || s.endsWith("te") || s.endsWith("et")))
        return s.dropRight(2)
      if (n > 3 && "taen".indexOf(s.last) >= 0) return s.dropRight(1)
      s
    }
  }

  /** Norwegian light (Savoy-derived, hand-crafted per the reference) with
    * Bokmål / Nynorsk ending selection. */
  final class NorwegianLight(bokmaal: Boolean, nynorsk: Boolean) {
    def stem(w: String): String = {
      var s = w
      if (s.length > 4 && s.last == 's') s = s.dropRight(1)
      val n = s.length
      if (n > 7 && ((bokmaal && (s.endsWith("heter") || s.endsWith("heten"))) ||
        (nynorsk && s.endsWith("heita")))) return s.dropRight(5)
      if (n > 8 && nynorsk && (s.endsWith("heiter") || s.endsWith("leiken") ||
        s.endsWith("leikar"))) return s.dropRight(6)
      if (n > 5 && (s.endsWith("dom") || (bokmaal && s.endsWith("het"))))
        return s.dropRight(3)
      if (n > 6 && nynorsk && (s.endsWith("heit") || s.endsWith("semd") ||
        s.endsWith("leik"))) return s.dropRight(4)
      if (n > 7 && (s.endsWith("elser") || s.endsWith("elsen"))) return s.dropRight(5)
      if (n > 6 && ((bokmaal && s.endsWith("ende")) || (nynorsk && s.endsWith("ande")) ||
        s.endsWith("else") || (bokmaal && s.endsWith("este")) ||
        (nynorsk && s.endsWith("aste")) || (bokmaal && s.endsWith("eren")) ||
        (nynorsk && s.endsWith("aren")))) return s.dropRight(4)
      if (n > 5 && ((bokmaal && s.endsWith("ere")) || (nynorsk && s.endsWith("are")) ||
        (bokmaal && s.endsWith("est")) || (nynorsk && s.endsWith("ast")) ||
        s.endsWith("ene") || (nynorsk && s.endsWith("ane")))) return s.dropRight(3)
      if (n > 4 && (s.endsWith("er") || s.endsWith("en") || s.endsWith("et") ||
        (nynorsk && s.endsWith("ar")) || (bokmaal && s.endsWith("st")) ||
        s.endsWith("te"))) return s.dropRight(2)
      if (n > 3 && "aen".indexOf(s.last) >= 0) return s.dropRight(1)
      s
    }
  }

  /** Norwegian minimal: known noun plurals + genitive -s only. */
  final class NorwegianMinimal(nynorsk: Boolean) {
    def stem(w: String): String = {
      var s = w
      if (s.length > 4 && s.last == 's') s = s.dropRight(1)
      val n = s.length
      if (n > 5 && (s.endsWith("ene") || (nynorsk && s.endsWith("ane"))))
        return s.dropRight(3)
      if (n > 4 && (s.endsWith("er") || s.endsWith("en") || s.endsWith("et") ||
        (nynorsk && s.endsWith("ar")))) return s.dropRight(2)
      if (n > 3 && (s.last == 'a' || s.last == 'e')) return s.dropRight(1)
      s
    }
  }

  val norwegianLightNb = new NorwegianLight(bokmaal = true, nynorsk = false)
  val norwegianLightNn = new NorwegianLight(bokmaal = false, nynorsk = true)
  val norwegianMinimalNb = new NorwegianMinimal(nynorsk = false)
  val norwegianMinimalNn = new NorwegianMinimal(nynorsk = true)

  /** Finnish light (Savoy): clitic/derivational prefix steps, case removal,
    * and the -hde→-ksi / doubled-kpt normalizations. */
  object FinnishLight {
    @inline private def vowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0
    private def step1(in: String): String = {
      val n = in.length
      if (n > 8) {
        if (in.endsWith("kin")) return step1(in.dropRight(3))
        if (in.endsWith("ko"))  return step1(in.dropRight(2))
      }
      if (n > 11) {
        if (in.endsWith("dellinen"))  return in.dropRight(8)
        if (in.endsWith("dellisuus")) return in.dropRight(9)
      }
      in
    }
    private def step2(s: String): String = {
      val n = s.length
      if (n > 5) {
        if (s.endsWith("lla") || s.endsWith("tse") || s.endsWith("sti")) return s.dropRight(3)
        if (s.endsWith("ni")) return s.dropRight(2)
        if (s.endsWith("aa")) return s.dropRight(1)
      }
      s
    }
    private def step3(s: String): String = {
      val n = s.length
      if (n > 8) {
        if (s.endsWith("nnen"))  return s.dropRight(4) + "s"
        if (s.endsWith("ntena")) return s.dropRight(5) + "s"
        if (s.endsWith("tten"))  return s.dropRight(4)
        if (s.endsWith("eiden")) return s.dropRight(5)
      }
      if (n > 6) {
        if (s.endsWith("neen") || s.endsWith("niin") || s.endsWith("seen") ||
          s.endsWith("teen") || s.endsWith("inen")) return s.dropRight(4)
        if (s.charAt(n - 3) == 'h' && vowel(s.charAt(n - 2)) && s.last == 'n')
          return s.dropRight(3)
        if (s.endsWith("den"))  return s.dropRight(3) + "s"
        if (s.endsWith("ksen")) return s.dropRight(4) + "s"
        if (s.endsWith("ssa") || s.endsWith("sta") || s.endsWith("lla") ||
          s.endsWith("lta") || s.endsWith("tta") || s.endsWith("ksi") ||
          s.endsWith("lle")) return s.dropRight(3)
      }
      if (n > 5) {
        if (s.endsWith("na") || s.endsWith("ne")) return s.dropRight(2)
        if (s.endsWith("nei")) return s.dropRight(3)
      }
      if (n > 4) {
        if (s.endsWith("ja") || s.endsWith("ta")) return s.dropRight(2)
        if (s.last == 'a') return s.dropRight(1)
        if (s.last == 'n' && vowel(s.charAt(n - 2))) return s.dropRight(2)
        if (s.last == 'n') return s.dropRight(1)
      }
      s
    }
    private def norm1(in: String): String = {
      var s = in
      if (s.length > 5 && s.endsWith("hde")) s = s.dropRight(3) + "ksi"
      if (s.length > 4 && (s.endsWith("ei") || s.endsWith("at"))) return s.dropRight(2)
      if (s.length > 3 && "tsjeai".indexOf(s.last) >= 0) return s.dropRight(1)
      s
    }
    private def norm2(in: String): String = {
      var s = in
      if (s.length > 8 && "eou".indexOf(s.last) >= 0) s = s.dropRight(1)
      if (s.length > 4) {
        if (s.last == 'i') s = s.dropRight(1)
        if (s.length > 4) {
          val b = new StringBuilder(s)
          var i = 1
          while (i < b.length) {
            val c = b.charAt(i)
            if (c == b.charAt(i - 1) && (c == 'k' || c == 'p' || c == 't'))
              b.deleteCharAt(i)
            else i += 1
          }
          s = b.toString
        }
      }
      s
    }
    def stem(w: String): String = {
      if (w.length < 4) return w
      val folded = w.map { case 'ä' | 'å' => 'a'; case 'ö' => 'o'; case c => c }
      norm2(norm1(step3(step2(step1(folded)))))
    }
  }

  /** Hungarian light (Savoy): case → possessive → plural → final-vowel. */
  object HungarianLight {
    @inline private def vowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0
    private val case3 = Seq("nak", "nek", "val", "vel", "ert", "rol", "ban",
      "ben", "bol", "nal", "nel", "hoz", "hez", "tol")
    private val case2 = Seq("at", "et", "ot", "va", "ve", "ra", "re", "ba",
      "be", "ul", "ig")
    private def removeCase(in: String): String = {
      val s = in; val n = s.length
      if (n > 6 && s.endsWith("kent")) return s.dropRight(4)
      if (n > 5) {
        if (case3.exists(s.endsWith)) return s.dropRight(3)
        if ((s.endsWith("al") || s.endsWith("el")) && n >= 4 &&
          !vowel(s.charAt(n - 3)) && s.charAt(n - 3) == s.charAt(n - 4))
          return s.dropRight(3)
      }
      if (n > 4) {
        if (case2.exists(s.endsWith)) return s.dropRight(2)
        if ((s.endsWith("on") || s.endsWith("en")) && !vowel(s.charAt(n - 3)))
          return s.dropRight(2)
        s.last match {
          case 't' | 'n' => return s.dropRight(1)
          case 'a' | 'e' if s.charAt(n - 2) == s.charAt(n - 3) && !vowel(s.charAt(n - 2)) =>
            return s.dropRight(2)
          case _ =>
        }
      }
      s
    }
    private def removePossessive(in: String): String = {
      val s = in; val n = s.length
      if (n > 6) {
        if (!vowel(s.charAt(n - 5)) &&
          (s.endsWith("atok") || s.endsWith("otok") || s.endsWith("etek")))
          return s.dropRight(4)
        if (s.endsWith("itek") || s.endsWith("itok")) return s.dropRight(4)
      }
      if (n > 5) {
        if (!vowel(s.charAt(n - 4)) &&
          (s.endsWith("unk") || s.endsWith("tok") || s.endsWith("tek")))
          return s.dropRight(3)
        if (vowel(s.charAt(n - 4)) && s.endsWith("juk")) return s.dropRight(3)
        if (s.endsWith("ink")) return s.dropRight(3)
      }
      if (n > 4) {
        if (!vowel(s.charAt(n - 3)) &&
          (s.endsWith("am") || s.endsWith("em") || s.endsWith("om") ||
            s.endsWith("ad") || s.endsWith("ed") || s.endsWith("od") ||
            s.endsWith("uk"))) return s.dropRight(2)
        if (vowel(s.charAt(n - 3)) &&
          (s.endsWith("nk") || s.endsWith("ja") || s.endsWith("je")))
          return s.dropRight(2)
        if (s.endsWith("im") || s.endsWith("id") || s.endsWith("ik"))
          return s.dropRight(2)
      }
      if (n > 3) s.last match {
        case 'a' | 'e' if !vowel(s.charAt(n - 2)) => return s.dropRight(1)
        case 'm' | 'd' if vowel(s.charAt(n - 2))  => return s.dropRight(1)
        case 'i' => return s.dropRight(1)
        case _ =>
      }
      s
    }
    private def removePlural(s: String): String = {
      val n = s.length
      if (n > 3 && s.last == 'k') {
        if ("aoe".indexOf(s.charAt(n - 2)) >= 0 && n > 4) s.dropRight(2)
        else s.dropRight(1)
      } else s
    }
    def stem(w: String): String = {
      val folded = w.map {
        case 'á' => 'a'
        case 'ë' | 'é' => 'e'
        case 'í' => 'i'
        case 'ó' | 'ő' | 'õ' | 'ö' => 'o'
        case 'ú' | 'ű' | 'ũ' | 'û' | 'ü' => 'u'
        case c => c
      }
      val s = removePlural(removePossessive(removeCase(folded)))
      if (s.length > 3 && "aeio".indexOf(s.last) >= 0) s.dropRight(1) else s
    }
  }

  /** Sorani Kurdish normalization (the reference's SoraniNormalizer):
    * yeh/kaf unification, final heh → ae, zwnj/tatweel/harakat removal. */
  object SoraniNormalizer {
    private final val Yeh = 'ي'; private final val DotlessYeh = 'ى'
    private final val FarsiYeh = 'ی'
    private final val Kaf = 'ك'; private final val Keheh = 'ک'
    private final val Heh = 'ه'; private final val Ae = 'ە'
    private final val Zwnj = '‌'; private final val HehDoachashmee = 'ھ'
    private final val TehMarbuta = 'ة'
    private final val Reh = 'ر'; private final val Rreh = 'ڕ'
    private final val RrehAbove = 'ڒ'; private final val Tatweel = 'ـ'

    def normalize(w: String): String = {
      val b = new StringBuilder(w.length)
      var i = 0
      while (i < w.length) {
        val c = w.charAt(i)
        c match {
          case Yeh | DotlessYeh => b += FarsiYeh
          case Kaf => b += Keheh
          case Zwnj => // zwnj: a heh before it becomes ae; the zwnj drops
            if (b.nonEmpty && b.last == Heh) b.setCharAt(b.length - 1, Ae)
          case Heh =>
            // final heh -> ae: deletions only ever happen at or before the
            // scan position, so "last remaining char" == "last input char"
            if (i == w.length - 1) b += Ae else b += c
          case TehMarbuta => b += Ae
          case HehDoachashmee => b += Heh
          case Reh => if (b.isEmpty) b += Rreh else b += c
          case RrehAbove => b += Rreh
          case Tatweel => // drop
          case _ if c >= 'ً' && c <= 'ْ' => // harakat: drop
          case _ => if (Character.getType(c) != Character.FORMAT) b += c
        }
        i += 1
      }
      b.toString
    }
  }

  /** Sorani Kurdish light stemmer (the reference's SoraniStemmer suffix
    * chain: postposition, possessive, then definite/indefinite markers). */
  object SoraniStem {
    def stem(w: String): String = {
      var s = w
      val n0 = s.length
      if (n0 > 5 && s.endsWith("دا")) s = s.dropRight(2)
      else if (n0 > 4 && s.endsWith("نا")) s = s.dropRight(1)
      else if (n0 > 6 && s.endsWith("ەوە")) s = s.dropRight(3)
      if (s.length > 6 && (s.endsWith("مان") || s.endsWith("یان") || s.endsWith("تان")))
        s = s.dropRight(3)
      val n = s.length
      if (n > 6 && s.endsWith("ێکی")) return s.dropRight(3)
      if (n > 7 && s.endsWith("یەکی")) return s.dropRight(4)
      if (n > 5 && s.endsWith("ێک")) return s.dropRight(2)
      if (n > 6 && s.endsWith("یەک")) return s.dropRight(3)
      if (n > 6 && s.endsWith("ەکە")) return s.dropRight(3)
      if (n > 5 && s.endsWith("کە")) return s.dropRight(2)
      if (n > 7 && s.endsWith("ەکان")) return s.dropRight(4)
      if (n > 6 && s.endsWith("کان")) return s.dropRight(3)
      if (n > 7 && s.endsWith("یانی")) return s.dropRight(4)
      if (n > 6 && s.endsWith("انی")) return s.dropRight(3)
      if (n > 6 && s.endsWith("یان")) return s.dropRight(3)
      if (n > 5 && s.endsWith("ان")) return s.dropRight(2)
      if (n > 7 && s.endsWith("یانە")) return s.dropRight(4)
      if (n > 6 && s.endsWith("انە")) return s.dropRight(3)
      if (n > 5 && (s.endsWith("ایە") || s.endsWith("ەیە"))) return s.dropRight(2)
      if (n > 4 && s.endsWith("ە")) return s.dropRight(1)
      if (n > 4 && s.endsWith("ی")) return s.dropRight(1)
      s
    }
    def stemNormalized(w: String): String = stem(SoraniNormalizer.normalize(w))
  }

  /** Latvian light stemmer (the reference's lv/LatvianStemmer — "A Stemming
    * Algorithm for Latvian", Kreslins-derived light variant): first matching
    * affix from the ordered table strips iff the word keeps >= 3 chars and
    * more vowels than the affix contains; some strips then un-palatalize the
    * stem-final consonant cluster. */
  object LatvianLight {
    // (affix, vowel count, fires un-palatalization)
    private val affixes = Seq(
      ("ajiem", 3, false), ("ajai", 3, false), ("ajam", 2, false),
      ("ajām", 2, false), ("ajos", 2, false), ("ajās", 2, false),
      ("iem", 2, true), ("ajā", 2, false), ("ais", 2, false),
      ("ai", 2, false), ("ei", 2, false), ("ām", 1, false), ("am", 1, false),
      ("ēm", 1, false), ("īm", 1, false), ("im", 1, false), ("um", 1, false),
      ("us", 1, true), ("as", 1, false), ("ās", 1, false), ("es", 1, false),
      ("os", 1, true), ("ij", 1, false), ("īs", 1, false), ("ēs", 1, false),
      ("is", 1, false), ("ie", 1, false), ("u", 1, true), ("a", 1, true),
      ("i", 1, true), ("e", 1, false), ("ā", 1, false), ("ē", 1, false),
      ("ī", 1, false), ("ū", 1, false), ("o", 1, false), ("s", 0, false),
      ("š", 0, false))
    private def vowels(s: String): Int = s.count("aeiouāīēū".indexOf(_) >= 0)
    private def unpalatalize(stem: String, removedFirst: Char): String = {
      // -u strips are gen.pl. — only there kš->kst and ņņ->nn apply
      if (removedFirst == 'u') {
        if (stem.endsWith("kš")) return stem.dropRight(2) + "kst"
        if (stem.endsWith("ņņ")) return stem.dropRight(2) + "nn"
      }
      if (stem.endsWith("pj") || stem.endsWith("bj") ||
          stem.endsWith("mj") || stem.endsWith("vj")) stem.dropRight(1)
      else if (stem.endsWith("šņ")) stem.dropRight(2) + "sn"
      else if (stem.endsWith("žņ")) stem.dropRight(2) + "zn"
      else if (stem.endsWith("šļ")) stem.dropRight(2) + "sl"
      else if (stem.endsWith("žļ")) stem.dropRight(2) + "zl"
      else if (stem.endsWith("ļņ")) stem.dropRight(2) + "ln"
      else if (stem.endsWith("ļļ")) stem.dropRight(2) + "ll"
      else if (stem.nonEmpty && stem.last == 'č') stem.dropRight(1) + "c"
      else if (stem.nonEmpty && stem.last == 'ļ') stem.dropRight(1) + "l"
      else if (stem.nonEmpty && stem.last == 'ņ') stem.dropRight(1) + "n"
      else stem
    }
    def stem(w: String): String = {
      val nv = vowels(w)
      affixes.collectFirst {
        case (a, vc, pal) if nv > vc && w.length >= a.length + 3 && w.endsWith(a) =>
          val stemmed = w.dropRight(a.length)
          if (pal) unpalatalize(stemmed, a.head) else stemmed
      }.getOrElse(w)
    }
  }

  /** Czech light stemmer (Dolamic & Savoy, "Indexing and stemming
    * approaches for the Czech language"): case endings, possessives, then
    * the čt/št/c/z/e-insertion/ů normalizations. */
  object CzechLight {
    private val case3 = Seq("ech", "ich", "ích", "ého", "ěmi", "emi", "ému",
      "ěte", "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách",
      "ata", "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
    private val case2 = Seq("em", "es", "ém", "ím", "ům", "at", "ám", "os",
      "us", "ým", "mi", "ou")
    private def removeCase(s: String): String = {
      val n = s.length
      if (n > 7 && s.endsWith("atech")) return s.dropRight(5)
      if (n > 6 && (s.endsWith("ětem") || s.endsWith("etem") || s.endsWith("atům")))
        return s.dropRight(4)
      if (n > 5 && case3.exists(s.endsWith)) return s.dropRight(3)
      if (n > 4 && case2.exists(s.endsWith)) return s.dropRight(2)
      if (n > 3 && "aeiouůyáéíýě".indexOf(s.last) >= 0) return s.dropRight(1)
      s
    }
    private def removePossessives(s: String): String =
      if (s.length > 5 && (s.endsWith("ov") || s.endsWith("in") || s.endsWith("ův")))
        s.dropRight(2)
      else s
    private def normalize(s: String): String = {
      if (s.endsWith("čt")) return s.dropRight(2) + "ck"
      if (s.endsWith("št")) return s.dropRight(2) + "sk"
      s.last match {
        case 'c' | 'č' => return s.dropRight(1) + "k"
        case 'z' | 'ž' => return s.dropRight(1) + "h"
        case _ =>
      }
      val n = s.length
      if (n > 1 && s.charAt(n - 2) == 'e')
        s.substring(0, n - 2) + s.charAt(n - 1) // e-insertion undone
      else if (n > 2 && s.charAt(n - 2) == 'ů')
        s.substring(0, n - 2) + "o" + s.charAt(n - 1)
      else s
    }
    def stem(w: String): String = {
      val s = removePossessives(removeCase(w))
      if (s.nonEmpty) normalize(s) else s
    }
  }

  /** Bulgarian light stemmer (Nakov's BulStem-derived rules in the
    * reference's bg/BulgarianStemmer): definite article, plural, and the
    * ен/ъ elision reversals. */
  object BulgarianLight {
    private def removeArticle(s: String): String = {
      val n = s.length
      if (n > 6 && s.endsWith("ият")) return s.dropRight(3)
      if (n > 5 && (s.endsWith("ът") || s.endsWith("то") || s.endsWith("те") ||
        s.endsWith("та") || s.endsWith("ия"))) return s.dropRight(2)
      if (n > 4 && s.endsWith("ят")) return s.dropRight(2)
      s
    }
    private def removePlural(s: String): String = {
      val n = s.length
      if (n > 6) {
        if (s.endsWith("овци")) return s.dropRight(3)
        if (s.endsWith("ове")) return s.dropRight(3)
        if (s.endsWith("еве")) return s.dropRight(3) + "й"
      }
      if (n > 5) {
        if (s.endsWith("ища")) return s.dropRight(3)
        if (s.endsWith("та")) return s.dropRight(2)
        if (s.endsWith("ци")) return s.dropRight(2) + "к"
        if (s.endsWith("зи")) return s.dropRight(2) + "г"
        if (s.charAt(n - 3) == 'е' && s.last == 'и')
          return s.substring(0, n - 3) + "я" + s.charAt(n - 2)
      }
      if (n > 4) {
        if (s.endsWith("си")) return s.dropRight(2) + "х"
        if (s.endsWith("и")) return s.dropRight(1)
      }
      s
    }
    def stem(w: String): String = {
      if (w.length < 4) return w
      if (w.length > 5 && w.endsWith("ища")) return w.dropRight(3)
      var s = removePlural(removeArticle(w))
      if (s.length > 3) {
        if (s.endsWith("я")) s = s.dropRight(1)
        if (s.endsWith("а") || s.endsWith("о") || s.endsWith("е")) s = s.dropRight(1)
      }
      if (s.length > 4 && s.endsWith("ен")) s = s.dropRight(2) + "н"
      if (s.length > 5 && s.charAt(s.length - 2) == 'ъ')
        s = s.substring(0, s.length - 2) + s.last
      s
    }
  }

  /** Indonesian stemmer (Tala, "A Study of Stemming Effects on Information
    * Retrieval in Bahasa Indonesia"): particle and possessive clitics, then
    * the ordered first/second-order prefix + suffix interplay with the
    * removed-prefix guards. Full derivational stemming (the reference
    * IndonesianStemFilter default). */
  object Indonesian {
    private final val KE = 1; private final val PENG = 2; private final val DI = 4
    private final val MENG = 8; private final val TER = 16; private final val BER = 32
    private final val PE = 64
    @inline private def vowel(c: Char): Boolean = "aeiou".indexOf(c) >= 0

    def stem(w: String): String = stem(w, derivational = true)

    /** Inflectional-only mode (stemDerivational=false in the reference
      * filter): clitic particles and possessives, no prefix/suffix phase. */
    def stemInflectional(w: String): String = stem(w, derivational = false)

    def stem(w: String, derivational: Boolean): String = {
      var s = w
      var syll = s.count(vowel)
      var flags = 0

      if (syll > 2) { // particles: -kah/-lah/-pun
        if (s.endsWith("kah") || s.endsWith("lah") || s.endsWith("pun")) {
          syll -= 1; s = s.dropRight(3)
        }
      }
      if (syll > 2) { // possessives: -ku/-mu/-nya
        if (s.endsWith("ku") || s.endsWith("mu")) { syll -= 1; s = s.dropRight(2) }
        else if (s.endsWith("nya")) { syll -= 1; s = s.dropRight(3) }
      }

      def firstOrderPrefix(in: String): String = {
        val t = in
        if (t.startsWith("meng")) { flags |= MENG; syll -= 1; return t.drop(4) }
        if (t.startsWith("meny") && t.length > 4 && vowel(t.charAt(4))) {
          flags |= MENG; syll -= 1; return "s" + t.drop(4)
        }
        if (t.startsWith("men")) { flags |= MENG; syll -= 1; return t.drop(3) }
        if (t.startsWith("mem")) { flags |= MENG; syll -= 1; return t.drop(3) }
        if (t.startsWith("me"))  { flags |= MENG; syll -= 1; return t.drop(2) }
        if (t.startsWith("peng")) { flags |= PENG; syll -= 1; return t.drop(4) }
        if (t.startsWith("peny") && t.length > 4 && vowel(t.charAt(4))) {
          flags |= PENG; syll -= 1; return "s" + t.drop(4)
        }
        if (t.startsWith("peny")) { flags |= PENG; syll -= 1; return t.drop(4) }
        if (t.startsWith("pen") && t.length > 3 && vowel(t.charAt(3))) {
          flags |= PENG; syll -= 1; return "t" + t.drop(3)
        }
        if (t.startsWith("pen")) { flags |= PENG; syll -= 1; return t.drop(3) }
        if (t.startsWith("pem")) { flags |= PENG; syll -= 1; return t.drop(3) }
        if (t.startsWith("di"))  { flags |= DI; syll -= 1; return t.drop(2) }
        if (t.startsWith("ter")) { flags |= TER; syll -= 1; return t.drop(3) }
        if (t.startsWith("ke"))  { flags |= KE; syll -= 1; return t.drop(2) }
        t
      }
      def secondOrderPrefix(in: String): String = {
        val t = in
        if (t.startsWith("ber")) { flags |= BER; syll -= 1; return t.drop(3) }
        if (t == "belajar") { flags |= BER; syll -= 1; return t.drop(3) }
        if (t.startsWith("be") && t.length > 4 && !vowel(t.charAt(2)) &&
          t.charAt(3) == 'e' && t.charAt(4) == 'r') {
          flags |= BER; syll -= 1; return t.drop(2)
        }
        if (t.startsWith("per")) { syll -= 1; return t.drop(3) }
        if (t == "pelajar") { syll -= 1; return t.drop(3) }
        if (t.startsWith("pe")) { flags |= PE; syll -= 1; return t.drop(2) }
        t
      }
      def suffix(in: String): String = {
        val t = in
        if (t.endsWith("kan") && (flags & KE) == 0 && (flags & PENG) == 0 &&
          (flags & PE) == 0) { syll -= 1; return t.dropRight(3) }
        if (t.endsWith("an") && (flags & DI) == 0 && (flags & MENG) == 0 &&
          (flags & TER) == 0) { syll -= 1; return t.dropRight(2) }
        if (t.endsWith("i") && !t.endsWith("si") && (flags & BER) == 0 &&
          (flags & KE) == 0 && (flags & PENG) == 0) { syll -= 1; return t.dropRight(1) }
        t
      }

      if (!derivational) return s
      // derivational phase: first-order prefix, then (on success) suffix
      // then (on success) second-order prefix; on first-order failure the
      // order flips to second-order prefix then suffix
      val before = s.length
      if (syll > 2) s = firstOrderPrefix(s)
      if (s.length != before) {
        val mid = s.length
        if (syll > 2) s = suffix(s)
        if (s.length != mid) { if (syll > 2) s = secondOrderPrefix(s) }
      } else {
        if (syll > 2) s = secondOrderPrefix(s)
        if (syll > 2) s = suffix(s)
      }
      s
    }
  }
}
