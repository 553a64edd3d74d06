package graft.analysis

/**
 * Brazilian Portuguese stemmer (the reference's br/BrazilianStemmer.java —
 * an Orengo-style suffix stripper distinct from both the Snowball
 * Portuguese algorithm and RSLP): accent folding, R1/R2/RV regions with
 * the reference's own boundary definitions, a guarded derivational step,
 * an exhaustive verb-suffix step over RV, and the final i/os/a/o/e
 * cleanups. Rule tables were extracted mechanically from the reference
 * source to preserve order, length gates, and its two deliberate quirks:
 * the "logias" rule that tests-and-fires without changing the term, and
 * duplicate verb entries that are shadowed by earlier ones.
 *
 * Validated against the reference's inline golden cases (br_golden.tsv).
 */
object Brazilian {

  @inline private def vowel(c: Char): Boolean = "aeiou".indexOf(c) >= 0

  /** The reference's getR1: text after the first non-vowel following the
    * first vowel — but never including the last character (its loop
    * bounds stop at length-1). */
  private def r1Of(v: String): String = {
    if (v == null) return null
    val i = v.length - 1
    var j = 0
    while (j < i && !vowel(v.charAt(j))) j += 1
    if (j >= i) return null
    while (j < i && vowel(v.charAt(j))) j += 1
    if (j >= i) return null
    v.substring(j + 1)
  }

  /** The reference's getRV with its three cases (consonant-start,
    * double-vowel start, fixed position 3). */
  private def rvOf(v: String): String = {
    if (v == null) return null
    val i = v.length - 1
    if (i > 0 && !vowel(v.charAt(1))) {
      var j = 2
      while (j < i && !vowel(v.charAt(j))) j += 1
      if (j < i) return v.substring(j + 1)
    }
    if (i > 1 && vowel(v.charAt(0)) && vowel(v.charAt(1))) {
      var j = 2
      while (j < i && vowel(v.charAt(j))) j += 1
      if (j < i) return v.substring(j + 1)
    }
    if (i > 2) v.substring(3) else null
  }

  private val ptBR = new java.util.Locale("pt", "BR")
  private def fold(v: String): String = v.toLowerCase(ptBR).map {
    case 'á' | 'â' | 'ã' => 'a'
    case 'é' | 'ê' => 'e'
    case 'í' => 'i'
    case 'ó' | 'ô' | 'õ' => 'o'
    case 'ú' | 'ü' => 'u'
    case 'ç' => 'c'
    case 'ñ' => 'n'
    case c => c
  }

  private def trimPunct(in: String): String = {
    var ct = in
    if (ct.length >= 2 && "\"'-,;.?!".indexOf(ct.charAt(0)) >= 0) ct = ct.substring(1)
    if (ct.length >= 2 && "-,;.?!'\"".indexOf(ct.charAt(ct.length - 1)) >= 0)
      ct = ct.substring(0, ct.length - 1)
    ct
  }

  @inline private def ends(v: String, s: String): Boolean =
    v != null && v.length >= s.length && v.endsWith(s)

  // (CT-length gate, suffix, guard region, preceded-by, action)
  // action: "" = remove; "=x" = replace with x; "!" = fire without change
  private val step1Rules: Seq[(Int, String, String, String, String)] = Seq(
    (0, "uciones", "R2", "", "=u"),
    (6, "imentos", "R2", "", ""), (6, "amentos", "R2", "", ""),
    (6, "adores", "R2", "", ""), (6, "adoras", "R2", "", ""),
    (6, "logias", "R2", "", "!"), (6, "encias", "R2", "", "=ente"),
    (6, "amente", "R1", "", ""), (6, "idades", "R2", "", ""),
    (5, "acoes", "R2", "", ""), (5, "imento", "R2", "", ""),
    (5, "amento", "R2", "", ""), (5, "adora", "R2", "", ""),
    (5, "ismos", "R2", "", ""), (5, "istas", "R2", "", ""),
    (5, "logia", "R2", "", "=log"), (5, "ucion", "R2", "", "=u"),
    (5, "encia", "R2", "", "=ente"), (5, "mente", "R2", "", ""),
    (5, "idade", "R2", "", ""),
    (4, "acao", "R2", "", ""), (4, "ezas", "R2", "", ""),
    (4, "icos", "R2", "", ""), (4, "icas", "R2", "", ""),
    (4, "ismo", "R2", "", ""), (4, "avel", "R2", "", ""),
    (4, "ivel", "R2", "", ""), (4, "ista", "R2", "", ""),
    (4, "osos", "R2", "", ""), (4, "osas", "R2", "", ""),
    (4, "ador", "R2", "", ""), (4, "ivas", "R2", "", ""),
    (4, "ivos", "R2", "", ""), (4, "iras", "RV", "e", "=ir"),
    (3, "eza", "R2", "", ""), (3, "ico", "R2", "", ""),
    (3, "ica", "R2", "", ""), (3, "oso", "R2", "", ""),
    (3, "osa", "R2", "", ""), (3, "iva", "R2", "", ""),
    (3, "ivo", "R2", "", ""), (3, "ira", "RV", "e", "=ir"))

  // (RV-length gate, suffix) — ordered, first match removes from CT
  private val step2Rules: Seq[(Int, String)] = Seq(
    (7, "issemos"), (7, "essemos"), (7, "assemos"), (7, "ariamos"), (7, "eriamos"), (7, "iriamos"),
    (6, "iremos"), (6, "eremos"), (6, "aremos"), (6, "avamos"), (6, "iramos"), (6, "eramos"),
    (6, "aramos"), (6, "asseis"), (6, "esseis"), (6, "isseis"), (6, "arieis"), (6, "erieis"),
    (6, "irieis"), (5, "irmos"), (5, "iamos"), (5, "armos"), (5, "ermos"), (5, "areis"),
    (5, "ereis"), (5, "ireis"), (5, "asses"), (5, "esses"), (5, "isses"), (5, "astes"),
    (5, "assem"), (5, "essem"), (5, "issem"), (5, "ardes"), (5, "erdes"), (5, "irdes"),
    (5, "ariam"), (5, "eriam"), (5, "iriam"), (5, "arias"), (5, "erias"), (5, "irias"),
    (5, "estes"), (5, "istes"), (5, "areis"), (5, "aveis"), (4, "aria"), (4, "eria"),
    (4, "iria"), (4, "asse"), (4, "esse"), (4, "isse"), (4, "aste"), (4, "este"),
    (4, "iste"), (4, "arei"), (4, "erei"), (4, "irei"), (4, "aram"), (4, "eram"),
    (4, "iram"), (4, "avam"), (4, "arem"), (4, "erem"), (4, "irem"), (4, "ando"),
    (4, "endo"), (4, "indo"), (4, "arao"), (4, "erao"), (4, "irao"), (4, "adas"),
    (4, "idas"), (4, "aras"), (4, "eras"), (4, "iras"), (4, "avas"), (4, "ares"),
    (4, "eres"), (4, "ires"), (4, "ados"), (4, "idos"), (4, "amos"), (4, "emos"),
    (4, "imos"), (4, "iras"), (4, "ieis"), (3, "ada"), (3, "ida"), (3, "ara"),
    (3, "era"), (3, "ira"), (3, "iam"), (3, "ado"), (3, "ido"), (3, "ias"),
    (3, "ais"), (3, "eis"), (3, "ira"), (3, "ear"), (2, "ia"), (2, "ei"),
    (2, "am"), (2, "em"), (2, "ar"), (2, "er"), (2, "ir"), (2, "as"),
    (2, "es"), (2, "is"), (2, "eu"), (2, "iu"), (2, "iu"), (2, "ou"))

  /** Stem one (possibly cased/accented) term; non-stemmable terms return
    * their folded form, non-indexable terms (len<=2 or >=30) unchanged —
    * the BrazilianStemFilter contract. */
  def stem(term: String): String = {
    var ct = trimPunct(fold(term))
    if (ct.length >= 30 || ct.length <= 2) return term
    if (!ct.forall(Character.isLetter)) return ct

    val r1 = r1Of(ct)
    val r2 = r1Of(r1)
    val rv = rvOf(ct)

    // step 1: derivational suffixes, region-guarded
    var altered = false
    val it1 = step1Rules.iterator
    while (!altered && it1.hasNext) {
      val (gate, suf, region, prec, action) = it1.next()
      val regionStr = region match {
        case "R1" => r1; case "R2" => r2; case _ => rv
      }
      if ((gate == 0 || ct.length >= gate) && ends(ct, suf) && ends(regionStr, suf) &&
        (prec.isEmpty || ends(ct.dropRight(suf.length), prec))) {
        action match {
          case "!" => // the reference's logias rule: fires, term unchanged
          case "" => ct = ct.dropRight(suf.length)
          case rep => ct = ct.dropRight(suf.length) + rep.drop(1)
        }
        altered = true
      }
    }

    // step 2: verb suffixes over RV (only when step 1 did not fire)
    if (!altered && rv != null) {
      val it2 = step2Rules.iterator
      while (!altered && it2.hasNext) {
        val (gate, suf) = it2.next()
        if (rv.length >= gate && ends(rv, suf) && ends(ct, suf)) {
          ct = ct.dropRight(suf.length)
          altered = true
        }
      }
    }

    // recompute nothing: the reference keeps the ORIGINAL regions
    if (altered) {
      // step 3: trailing i after c
      if (rv != null && ends(rv, "i") && ends(rv.dropRight(1), "c") && ends(ct, "i"))
        ct = ct.dropRight(1)
    } else {
      // step 4: residual vowel suffixes — branch selection is on the
      // (possibly stale) RV, the removal re-checks the live term, and a
      // selected branch ENDS the step even when the removal no-ops
      if (rv != null) {
        if (ends(rv, "os")) { if (ends(ct, "os")) ct = ct.dropRight(2) }
        else if (ends(rv, "a")) { if (ends(ct, "a")) ct = ct.dropRight(1) }
        else if (ends(rv, "i")) { if (ends(ct, "i")) ct = ct.dropRight(1) }
        else if (ends(rv, "o")) { if (ends(ct, "o")) ct = ct.dropRight(1) }
      }
    }
    // step 5: final e (with gue/cie reversal)
    if (rv != null && ends(rv, "e")) {
      if (ends(rv.dropRight(1), "gu")) {
        if (ends(ct, "e")) ct = ct.dropRight(1)
        if (ends(ct, "u")) ct = ct.dropRight(1)
      } else if (ends(rv.dropRight(1), "ci")) {
        if (ends(ct, "e")) ct = ct.dropRight(1)
        if (ends(ct, "i")) ct = ct.dropRight(1)
      } else if (ends(ct, "e")) ct = ct.dropRight(1)
    }
    ct
  }
}
