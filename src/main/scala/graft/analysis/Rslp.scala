package graft.analysis

/**
 * RSLP ("Removedor de Sufixos da Lingua Portuguesa") rule-table stemming —
 * the algorithm of Orengo & Huyck, "A Stemming Algorithm for the Portuguese
 * Language" (SPIRE 2001), which the reference applies to Portuguese
 * (lucene/analysis/common/.../pt/PortugueseStemmer.java, RSLPStemmerBase
 * .java) and, via the community's adapted rule set, to Galician
 * (gl/GalicianStemmer.java).
 *
 * The published rule tables are data: each step is an ordered rule list
 * where a rule fires when (a) the word ends with the rule's suffix, (b) the
 * stem left after removing the suffix is at least `min` chars, and (c) the
 * word is not one of the rule's exceptions (whole-word or suffix-matched,
 * per step). The FIRST matching rule in a step fires and ends the step. The
 * tables live in src/main/resources/graft/rslp/{pt,gl}.tsv — re-encoded
 * from the published rules into a line-per-rule TSV.
 *
 * Step flow differs per language (PortugueseStemmer.java:36-55,
 * GalicianStemmer.java:36-59): Portuguese runs noun→verb→vowel as a
 * fallback chain (each only when the previous removed nothing); Galician
 * loops augmentative to a fixed point and always runs the vowel step.
 */
object Rslp {

  /** One suffix rule: strip `suffix` (leaving >= min chars), append
    * `replacement`, unless the word matches an exception. */
  final case class Rule(suffix: String, min: Int, replacement: String,
                        exceptions: Seq[String], wholeWordExceptions: Boolean) {
    def matches(w: String): Boolean =
      w.length - suffix.length >= min && w.endsWith(suffix) && {
        if (exceptions.isEmpty) true
        else if (wholeWordExceptions) !exceptions.contains(w)
        else !exceptions.exists(w.endsWith)
      }
    def fire(w: String): String = w.dropRight(suffix.length) + replacement
  }

  /** An ordered rule list with a word-size floor and optional entry
    * conditions (the word must end with one of `conds`). */
  final case class Step(name: String, minWord: Int, conds: Seq[String],
                        rules: Seq[Rule]) {
    private val effectiveMin =
      if (minWord > 0) minWord else rules.map(r => r.min + r.suffix.length).min
    def apply(w: String): String = {
      if (w.length < effectiveMin) return w
      if (conds.nonEmpty && !conds.exists(w.endsWith)) return w
      rules.collectFirst { case r if r.matches(w) => r.fire(w) }.getOrElse(w)
    }
  }

  /** Load a step table from the TSV encoding (S-line: step header;
    * R-lines: its rules in order). */
  def load(resource: String): Map[String, Step] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing rslp resource $resource")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val steps = Map.newBuilder[String, Step]
    var header: Option[(String, Int, Boolean, Seq[String])] = None
    val rules = Vector.newBuilder[Rule]
    def flush(): Unit = header.foreach { case (name, min, whole, conds) =>
      steps += name -> Step(name, min, conds, rules.result())
      rules.clear()
    }
    lines.foreach { line =>
      val f = line.split("\t", -1)
      f(0) match {
        case "S" =>
          flush()
          val conds = if (f.length > 4 && f(4).nonEmpty) f(4).split(",").toSeq else Nil
          header = Some((f(1), f(2).toInt, f(3) == "1", conds))
        case "R" =>
          val exc = if (f.length > 4 && f(4).nonEmpty) f(4).split(",").toSeq else Nil
          rules += Rule(f(1), f(2).toInt, if (f.length > 3) f(3) else "",
            exc, header.exists(_._3))
        case _ => // skip
      }
    }
    flush()
    steps.result()
  }

  private lazy val pt = load("/graft/rslp/pt.tsv")
  private lazy val gl = load("/graft/rslp/gl.tsv")

  /** Full Portuguese RSLP: plural → adverb → feminine → augmentative, then
    * noun / verb / vowel as a fallback chain, then accent removal. */
  object Portuguese {
    private def fold(s: String): String = s.map {
      case 'à' | 'á' | 'â' | 'ã' | 'ä' | 'å' => 'a'
      case 'ç' => 'c'
      case 'è' | 'é' | 'ê' | 'ë' => 'e'
      case 'ì' | 'í' | 'î' | 'ï' => 'i'
      case 'ñ' => 'n'
      case 'ò' | 'ó' | 'ô' | 'õ' | 'ö' => 'o'
      case 'ù' | 'ú' | 'û' | 'ü' => 'u'
      case 'ý' | 'ÿ' => 'y'
      case c => c
    }
    def stem(w: String): String = {
      var s = pt("Plural")(w)
      s = pt("Adverb")(s)
      s = pt("Feminine")(s)
      s = pt("Augmentative")(s)
      // the reference's "suffix not removed" checks are LENGTH-based
      // (PortugueseStemmer.java:43-50): a same-length rewrite counts as
      // no removal and falls through to the next step
      val afterNoun = pt("Noun")(s)
      s = if (afterNoun.length != s.length) afterNoun
      else {
        val afterVerb = pt("Verb")(s)
        if (afterVerb.length != s.length) afterVerb else pt("Vowel")(s)
      }
      fold(s)
    }
  }

  /** RSLP-S: the plural step only (the reference's PortugueseMinimalStemmer). */
  object PortugueseMinimal {
    def stem(w: String): String = pt("Plural")(w)
  }

  /** Full Galician flow: plural → unification → adverb → augmentative
    * (to a fixed point) → noun-else-verb → vowel → accent removal. */
  object Galician {
    private def fold(s: String): String = s.map {
      case 'á' => 'a'
      case 'é' | 'ê' => 'e'
      case 'í' => 'i'
      case 'ó' => 'o'
      case 'ú' => 'u'
      case c => c
    }
    def stem(w: String): String = {
      var s = gl("Plural")(w)
      s = gl("Unification")(s)
      s = gl("Adverb")(s)
      // fixed point / fall-through are LENGTH-based, as in the reference
      var prevLen = -1
      while (prevLen != s.length) { prevLen = s.length; s = gl("Augmentative")(s) }
      val afterNoun = gl("Noun")(s)
      s = if (afterNoun.length != s.length) afterNoun else gl("Verb")(s)
      s = gl("Vowel")(s)
      fold(s)
    }
  }

  /** Galician plural-only (the reference's GalicianMinimalStemmer). */
  object GalicianMinimal {
    def stem(w: String): String = gl("Plural")(w)
  }
}
