package graft.analysis

/**
 * Greek stemmer (the reference's el/GreekStemmer.java — Ntais'
 * "Development of a Stemmer for the Greek Language" with the Lucene
 * community's extended exception lists) plus the Greek-specific
 * lowercasing/diacritic fold (el/GreekLowerCaseFilter.java: final sigma
 * to sigma, tonos/dialytika vowels to their plain forms).
 *
 * The algorithm's add-back steps un-truncate previously removed
 * characters (the buffer retains them), so the port keeps the reference's
 * (char[], len) model: `len` moves left and right over an un-mutated
 * tail, and the handful of rules that overwrite characters do so in
 * place. Validated against the 342 inline golden cases of the
 * reference's TestGreekStemmer (el.tsv).
 */
object GreekStemmers {

  /** GreekLowerCaseFilter: lowercase + final-sigma + tonos folds. */
  def lower(word: String): String = word.map { c =>
    c match {
      case 'ς' => 'σ'
      case 'Ά' | 'ά' => 'α'
      case 'Έ' | 'έ' => 'ε'
      case 'Ή' | 'ή' => 'η'
      case 'Ί' | 'Ϊ' | 'ί' | 'ϊ' | 'ΐ' => 'ι'
      case 'Ύ' | 'Ϋ' | 'ύ' | 'ϋ' | 'ΰ' => 'υ'
      case 'Ό' | 'ό' => 'ο'
      case 'Ώ' | 'ώ' => 'ω'
      case other => Character.toLowerCase(other)
    }
  }

  @inline private def ends(s: Array[Char], len: Int, suf: String): Boolean = {
    val m = suf.length
    if (m > len) return false
    var i = 0
    while (i < m) { if (s(len - m + i) != suf.charAt(i)) return false; i += 1 }
    true
  }
  @inline private def vowel(s: Array[Char], len: Int): Boolean =
    len > 0 && "αεηιουω".indexOf(s(len - 1)) >= 0
  @inline private def vowelNoY(s: Array[Char], len: Int): Boolean =
    len > 0 && "αεηιοω".indexOf(s(len - 1)) >= 0
  @inline private def in(s: Array[Char], len: Int, set: Set[String]): Boolean =
    set.contains(new String(s, 0, len))

  private val exc4 = Set("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")
  private val exc6 = Set("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ",
    "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ",
    "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ",
    "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
    "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ", "χασ")
  private val exc7 = Set("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
    "πεθ", "πικρ", "ποτ", "σιχ", "χ")
  private val exc8a = Set("τρ", "τσ")
  private val exc8b = Set("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
    "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ",
    "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
    "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
    "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ",
    "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ",
    "μελ", "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ",
    "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ",
    "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ",
    "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
    "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ",
    "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ",
    "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ")
  private val exc9 = Set("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
    "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
    "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ")
  private val exc12a = Set("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
  private val exc12b = Set("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ")
  private val exc13 = Set("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")
  private val exc14 = Set("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ",
    "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε", "τσα")
  private val exc15a = Set("αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ",
    "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
    "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ",
    "ουλαμ", "ουρ", "π", "τρ", "μ")
  private val exc15b = Set("ψοφ", "ναυλοχ")
  private val exc16 = Set("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν")
  private val exc17 = Set("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
    "ευχρ", "κοινοχρ", "παλιμψ")
  private val exc18 = Set("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")
  private val exc19 = Set("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ")

  /** Stem an already Greek-lowercased word. */
  def stem(word: String): String = {
    if (word.length < 4) return word
    val s = word.toCharArray
    var len = s.length
    val orig = len

    // rule 0: irregular neuters (καθεστωσ, γεγονοσ, φωσ, κρεασ families)
    len = {
      val n = len
      if (n > 9 && (ends(s, n, "καθεστωτοσ") || ends(s, n, "καθεστωτων"))) n - 4
      else if (n > 8 && (ends(s, n, "γεγονοτοσ") || ends(s, n, "γεγονοτων"))) n - 4
      else if (n > 8 && ends(s, n, "καθεστωτα")) n - 3
      else if (n > 7 && (ends(s, n, "τατογιου") || ends(s, n, "τατογιων"))) n - 4
      else if (n > 7 && ends(s, n, "γεγονοτα")) n - 3
      else if (n > 7 && ends(s, n, "καθεστωσ")) n - 2
      else if (n > 6 && (ends(s, n, "σκαγιου") || ends(s, n, "σκαγιων") ||
        ends(s, n, "ολογιου") || ends(s, n, "ολογιων") || ends(s, n, "κρεατοσ") ||
        ends(s, n, "κρεατων") || ends(s, n, "περατοσ") || ends(s, n, "περατων") ||
        ends(s, n, "τερατοσ") || ends(s, n, "τερατων"))) n - 4
      else if (n > 6 && ends(s, n, "τατογια")) n - 3
      else if (n > 6 && ends(s, n, "γεγονοσ")) n - 2
      else if (n > 5 && (ends(s, n, "φαγιου") || ends(s, n, "φαγιων") ||
        ends(s, n, "σογιου") || ends(s, n, "σογιων"))) n - 4
      else if (n > 5 && (ends(s, n, "σκαγια") || ends(s, n, "ολογια") ||
        ends(s, n, "κρεατα") || ends(s, n, "περατα") || ends(s, n, "τερατα"))) n - 3
      else if (n > 4 && (ends(s, n, "φαγια") || ends(s, n, "σογια") ||
        ends(s, n, "φωτοσ") || ends(s, n, "φωτων"))) n - 3
      else if (n > 4 && (ends(s, n, "κρεασ") || ends(s, n, "περασ") ||
        ends(s, n, "τερασ"))) n - 2
      else if (n > 3 && ends(s, n, "φωτα")) n - 2
      else if (n > 2 && ends(s, n, "φωσ")) n - 1
      else n
    }

    // rule 1: -αδεσ/-αδων
    if (len > 4 && (ends(s, len, "αδεσ") || ends(s, len, "αδων"))) {
      len -= 4
      if (!(ends(s, len, "οκ") || ends(s, len, "μαμ") || ends(s, len, "μαν") ||
        ends(s, len, "μπαμπ") || ends(s, len, "πατερ") || ends(s, len, "γιαγι") ||
        ends(s, len, "νταντ") || ends(s, len, "κυρ") || ends(s, len, "θει") ||
        ends(s, len, "πεθερ"))) len += 2 // restore -αδ
    }
    // rule 2: -εδεσ/-εδων
    if (len > 4 && (ends(s, len, "εδεσ") || ends(s, len, "εδων"))) {
      len -= 4
      if (ends(s, len, "οπ") || ends(s, len, "ιπ") || ends(s, len, "εμπ") ||
        ends(s, len, "υπ") || ends(s, len, "γηπ") || ends(s, len, "δαπ") ||
        ends(s, len, "κρασπ") || ends(s, len, "μιλ")) len += 2 // restore -εδ
    }
    // rule 3: -ουδεσ/-ουδων
    if (len > 5 && (ends(s, len, "ουδεσ") || ends(s, len, "ουδων"))) {
      len -= 5
      if (ends(s, len, "αρκ") || ends(s, len, "καλιακ") || ends(s, len, "πεταλ") ||
        ends(s, len, "λιχ") || ends(s, len, "πλεξ") || ends(s, len, "σκ") ||
        ends(s, len, "σ") || ends(s, len, "φλ") || ends(s, len, "φρ") ||
        ends(s, len, "βελ") || ends(s, len, "λουλ") || ends(s, len, "χν") ||
        ends(s, len, "σπ") || ends(s, len, "τραγ") || ends(s, len, "φε"))
        len += 3 // restore -ουδ
    }
    // rule 4: -εωσ/-εων
    if (len > 3 && (ends(s, len, "εωσ") || ends(s, len, "εων"))) {
      len -= 3
      if (in(s, len, exc4)) len += 1 // restore -ε
    }
    // rule 5: -ια/-ιου/-ιων after a vowel keeps the ι
    if (len > 2 && ends(s, len, "ια")) {
      len -= 2
      if (vowel(s, len)) len += 1
    } else if (len > 3 && (ends(s, len, "ιου") || ends(s, len, "ιων"))) {
      len -= 3
      if (vowel(s, len)) len += 1
    }
    // rule 6: -ικα/-ικο/-ικου/-ικων
    {
      var removed = false
      if (len > 3 && (ends(s, len, "ικα") || ends(s, len, "ικο"))) {
        len -= 3; removed = true
      } else if (len > 4 && (ends(s, len, "ικου") || ends(s, len, "ικων"))) {
        len -= 4; removed = true
      }
      if (removed && (vowel(s, len) || in(s, len, exc6))) len += 2 // -ικ
    }
    // rule 7: -αμε verb forms
    if (len == 5 && ends(s, len, "αγαμε")) len -= 1
    else {
      if (len > 7 && ends(s, len, "ηθηκαμε")) len -= 7
      else if (len > 6 && ends(s, len, "ουσαμε")) len -= 6
      else if (len > 5 && (ends(s, len, "αγαμε") || ends(s, len, "ησαμε") ||
        ends(s, len, "ηκαμε"))) len -= 5
      if (len > 3 && ends(s, len, "αμε")) {
        len -= 3
        if (in(s, len, exc7)) len += 2 // -αμ
      }
    }
    // rule 8: -ανε verb forms (the reference's operator precedence leaves
    // the non-first alternatives of each else-if unguarded — mirrored)
    {
      var removed = false
      if (len > 8 && ends(s, len, "ιουντανε")) { len -= 8; removed = true }
      else if ((len > 7 && ends(s, len, "ιοντανε")) || ends(s, len, "ουντανε") ||
        ends(s, len, "ηθηκανε")) { len -= 7; removed = true }
      else if ((len > 6 && ends(s, len, "ιοτανε")) || ends(s, len, "οντανε") ||
        ends(s, len, "ουσανε")) { len -= 6; removed = true }
      else if ((len > 5 && ends(s, len, "αγανε")) || ends(s, len, "ησανε") ||
        ends(s, len, "οτανε") || ends(s, len, "ηκανε")) { len -= 5; removed = true }
      if (removed && in(s, len, exc8a)) {
        // these roots take back -αγαν (overwriting the removed suffix)
        len += 4
        s(len - 4) = 'α'; s(len - 3) = 'γ'; s(len - 2) = 'α'; s(len - 1) = 'ν'
      }
      if (len > 3 && ends(s, len, "ανε")) {
        len -= 3
        if (vowelNoY(s, len) || in(s, len, exc8b)) len += 2 // -αν
      }
    }
    // rule 9: -ετε
    if (len > 5 && ends(s, len, "ησετε")) len -= 5
    if (len > 3 && ends(s, len, "ετε")) {
      len -= 3
      if (in(s, len, exc9) || vowelNoY(s, len) ||
        ends(s, len, "οδ") || ends(s, len, "αιρ") || ends(s, len, "φορ") ||
        ends(s, len, "ταθ") || ends(s, len, "διαθ") || ends(s, len, "σχ") ||
        ends(s, len, "ενδ") || ends(s, len, "ευρ") || ends(s, len, "τιθ") ||
        ends(s, len, "υπερθ") || ends(s, len, "ραθ") || ends(s, len, "ενθ") ||
        ends(s, len, "ροθ") || ends(s, len, "σθ") || ends(s, len, "πυρ") ||
        ends(s, len, "αιν") || ends(s, len, "συνδ") || ends(s, len, "συν") ||
        ends(s, len, "συνθ") || ends(s, len, "χωρ") || ends(s, len, "πον") ||
        ends(s, len, "βρ") || ends(s, len, "καθ") || ends(s, len, "ευθ") ||
        ends(s, len, "εκθ") || ends(s, len, "νετ") || ends(s, len, "ρον") ||
        ends(s, len, "αρκ") || ends(s, len, "βαρ") || ends(s, len, "βολ") ||
        ends(s, len, "ωφελ")) len += 2 // -ετ
    }
    // rule 10: -οντασ/-ωντασ
    if (len > 5 && (ends(s, len, "οντασ") || ends(s, len, "ωντασ"))) {
      len -= 5
      if (len == 3 && ends(s, len, "αρχ")) { len += 3; s(len - 3) = 'ο' } // αρχοντ
      if (ends(s, len, "κρε")) { len += 3; s(len - 3) = 'ω' } // κρεωντ
    }
    // rule 11: -ομαστε/-ιομαστε
    if (len > 6 && ends(s, len, "ομαστε")) {
      len -= 6
      if (len == 2 && ends(s, len, "ον")) len += 5 // ονομαστ
    } else if (len > 7 && ends(s, len, "ιομαστε")) {
      len -= 7
      if (len == 2 && ends(s, len, "ον")) {
        len += 5
        s(len - 5) = 'ο'; s(len - 4) = 'μ'; s(len - 3) = 'α'
        s(len - 2) = 'σ'; s(len - 1) = 'τ'
      }
    }
    // rule 12: -ιεστε / -εστε (two sequential checks, as in the reference)
    if (len > 5 && ends(s, len, "ιεστε")) {
      len -= 5
      if (in(s, len, exc12a)) len += 4 // -ιεστ
    }
    if (len > 4 && ends(s, len, "εστε")) {
      len -= 4
      if (in(s, len, exc12b)) len += 3 // -εστ
    }
    // rule 13: -ηθηκ-/-ηκ- aorist passives
    {
      if (len > 6 && ends(s, len, "ηθηκεσ")) len -= 6
      else if (len > 5 && (ends(s, len, "ηθηκα") || ends(s, len, "ηθηκε"))) len -= 5
      var removed = false
      if (len > 4 && ends(s, len, "ηκεσ")) { len -= 4; removed = true }
      else if (len > 3 && (ends(s, len, "ηκα") || ends(s, len, "ηκε"))) {
        len -= 3; removed = true
      }
      if (removed && (in(s, len, exc13) || ends(s, len, "σκωλ") ||
        ends(s, len, "σκουλ") || ends(s, len, "ναρθ") || ends(s, len, "σφ") ||
        ends(s, len, "οθ") || ends(s, len, "πιθ"))) len += 2 // -ηκ
    }
    // rule 14: -ουσ- imperfects
    {
      var removed = false
      if (len > 5 && ends(s, len, "ουσεσ")) { len -= 5; removed = true }
      else if (len > 4 && (ends(s, len, "ουσα") || ends(s, len, "ουσε"))) {
        len -= 4; removed = true
      }
      if (removed && (in(s, len, exc14) || vowel(s, len) ||
        ends(s, len, "ποδαρ") || ends(s, len, "βλεπ") || ends(s, len, "πανταχ") ||
        ends(s, len, "φρυδ") || ends(s, len, "μαντιλ") || ends(s, len, "μαλλ") ||
        ends(s, len, "κυματ") || ends(s, len, "λαχ") || ends(s, len, "ληγ") ||
        ends(s, len, "φαγ") || ends(s, len, "ομ") || ends(s, len, "πρωτ")))
        len += 3 // -ουσ
    }
    // rule 15: -αγ- imperfects
    {
      var removed = false
      if (len > 4 && ends(s, len, "αγεσ")) { len -= 4; removed = true }
      else if (len > 3 && (ends(s, len, "αγα") || ends(s, len, "αγε"))) {
        len -= 3; removed = true
      }
      if (removed) {
        val keep = in(s, len, exc15a) || ends(s, len, "οφ") || ends(s, len, "πελ") ||
          ends(s, len, "χορτ") || ends(s, len, "λλ") || ends(s, len, "σφ") ||
          ends(s, len, "ρπ") || ends(s, len, "φρ") || ends(s, len, "πρ") ||
          ends(s, len, "λοχ") || ends(s, len, "σμην")
        val unless = in(s, len, exc15b) || ends(s, len, "κολλ")
        if (keep && !unless) len += 2 // -αγ
      }
    }
    // rule 16: -ησ- aorists
    {
      var removed = false
      if (len > 4 && ends(s, len, "ησου")) { len -= 4; removed = true }
      else if (len > 3 && (ends(s, len, "ησε") || ends(s, len, "ησα"))) {
        len -= 3; removed = true
      }
      if (removed && in(s, len, exc16)) len += 2 // -ησ
    }
    // rule 17: -ηστε
    if (len > 4 && ends(s, len, "ηστε")) {
      len -= 4
      if (in(s, len, exc17)) len += 3 // -ηστ
    }
    // rule 18: -ουνε forms
    {
      var removed = false
      if (len > 6 && (ends(s, len, "ησουνε") || ends(s, len, "ηθουνε"))) {
        len -= 6; removed = true
      } else if (len > 4 && ends(s, len, "ουνε")) { len -= 4; removed = true }
      if (removed && in(s, len, exc18)) {
        len += 3
        s(len - 3) = 'ο'; s(len - 2) = 'υ'; s(len - 1) = 'ν'
      }
    }
    // rule 19: -ουμε forms
    {
      var removed = false
      if (len > 6 && (ends(s, len, "ησουμε") || ends(s, len, "ηθουμε"))) {
        len -= 6; removed = true
      } else if (len > 4 && ends(s, len, "ουμε")) { len -= 4; removed = true }
      if (removed && in(s, len, exc19)) {
        len += 3
        s(len - 3) = 'ο'; s(len - 2) = 'υ'; s(len - 1) = 'μ'
      }
    }
    // rule 20: -ματ- neuters
    if (len > 5 && (ends(s, len, "ματων") || ends(s, len, "ματοσ"))) len -= 3
    else if (len > 4 && ends(s, len, "ματα")) len -= 2

    // rule 21 runs only when nothing above fired
    if (len == orig) len = rule21(s, len)
    len = rule22(s, len)
    new String(s, 0, len)
  }

  private def rule21(s: Array[Char], n: Int): Int = {
    if (n > 9 && ends(s, n, "ιοντουσαν")) return n - 9
    if (n > 8 && (ends(s, n, "ιομασταν") || ends(s, n, "ιοσασταν") ||
      ends(s, n, "ιουμαστε") || ends(s, n, "οντουσαν"))) return n - 8
    if (n > 7 && (ends(s, n, "ιεμαστε") || ends(s, n, "ιεσαστε") ||
      ends(s, n, "ιομουνα") || ends(s, n, "ιοσαστε") || ends(s, n, "ιοσουνα") ||
      ends(s, n, "ιουνται") || ends(s, n, "ιουνταν") || ends(s, n, "ηθηκατε") ||
      ends(s, n, "ομασταν") || ends(s, n, "οσασταν") || ends(s, n, "ουμαστε")))
      return n - 7
    if (n > 6 && (ends(s, n, "ιομουν") || ends(s, n, "ιονταν") ||
      ends(s, n, "ιοσουν") || ends(s, n, "ηθειτε") || ends(s, n, "ηθηκαν") ||
      ends(s, n, "ομουνα") || ends(s, n, "οσαστε") || ends(s, n, "οσουνα") ||
      ends(s, n, "ουνται") || ends(s, n, "ουνταν") || ends(s, n, "ουσατε")))
      return n - 6
    if (n > 5 && (ends(s, n, "αγατε") || ends(s, n, "ιεμαι") || ends(s, n, "ιεται") ||
      ends(s, n, "ιεσαι") || ends(s, n, "ιοταν") || ends(s, n, "ιουμα") ||
      ends(s, n, "ηθεισ") || ends(s, n, "ηθουν") || ends(s, n, "ηκατε") ||
      ends(s, n, "ησατε") || ends(s, n, "ησουν") || ends(s, n, "ομουν") ||
      ends(s, n, "ονται") || ends(s, n, "ονταν") || ends(s, n, "οσουν") ||
      ends(s, n, "ουμαι") || ends(s, n, "ουσαν"))) return n - 5
    if (n > 4 && (ends(s, n, "αγαν") || ends(s, n, "αμαι") || ends(s, n, "ασαι") ||
      ends(s, n, "αται") || ends(s, n, "ειτε") || ends(s, n, "εσαι") ||
      ends(s, n, "εται") || ends(s, n, "ηδεσ") || ends(s, n, "ηδων") ||
      ends(s, n, "ηθει") || ends(s, n, "ηκαν") || ends(s, n, "ησαν") ||
      ends(s, n, "ησει") || ends(s, n, "ησεσ") || ends(s, n, "ομαι") ||
      ends(s, n, "οταν"))) return n - 4
    if (n > 3 && (ends(s, n, "αει") || ends(s, n, "εισ") || ends(s, n, "ηθω") ||
      ends(s, n, "ησω") || ends(s, n, "ουν") || ends(s, n, "ουσ"))) return n - 3
    if (n > 2 && (ends(s, n, "αν") || ends(s, n, "ασ") || ends(s, n, "αω") ||
      ends(s, n, "ει") || ends(s, n, "εσ") || ends(s, n, "ησ") || ends(s, n, "οι") ||
      ends(s, n, "οσ") || ends(s, n, "ου") || ends(s, n, "υσ") || ends(s, n, "ων")))
      return n - 2
    if (n > 1 && vowel(s, n)) return n - 1
    n
  }

  private def rule22(s: Array[Char], n: Int): Int = {
    if (ends(s, n, "εστερ") || ends(s, n, "εστατ")) return n - 5
    if (ends(s, n, "οτερ") || ends(s, n, "οτατ") || ends(s, n, "υτερ") ||
      ends(s, n, "υτατ") || ends(s, n, "ωτερ") || ends(s, n, "ωτατ")) return n - 4
    n
  }

  /** The filter entry point: Greek-fold then stem (the GreekAnalyzer
    * chain's GreekLowerCaseFilter before GreekStemFilter). */
  def stemLowercased(word: String): String = stem(lower(word))
}
