package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * American Soundex phonetic encoding (reference: Solr's
 * PhoneticFilterFactory with the classic Soundex encoder,
 * solr/core/src/java/org/apache/solr/analysis/PhoneticFilterFactory.java
 * — capability re-implemented from the published algorithm, not ported):
 * first letter + up to three digits from the consonant classes
 * bfpv=1 cgjkqsxz=2 dt=3 l=4 mn=5 r=6; vowels (aeiouy) separate equal
 * codes, h/w do not; adjacent equal codes collapse; zero-padded to 4.
 *
 * Two implementations with identical semantics, tied together by
 * PhoneticSpec fuzzing:
 *  - [[Soundex.encode]], the scalar used by the index-time
 *    [[PhoneticFilter]];
 *  - [[Soundex.encodeCol]], a pure built-in Column chain (translate /
 *    regexp_replace / filter-with-index) so query-side phonetic matching
 *    stays inside whole-stage codegen and is DuckDB-oracle-expressible.
 */
object Soundex {

  private def code(c: Char): Char = c match {
    case 'b' | 'f' | 'p' | 'v' => '1'
    case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => '2'
    case 'd' | 't' => '3'
    case 'l' => '4'
    case 'm' | 'n' => '5'
    case 'r' => '6'
    case _ => '0' // vowels: break runs but emit nothing
  }

  /** Soundex code of a lowercase analyzer token; tokens not starting with
    * a letter pass through unchanged (digits inside a token are skipped
    * like h/w — they neither code nor break a run). */
  def encode(term: String): String = {
    if (term.isEmpty || term.charAt(0) < 'a' || term.charAt(0) > 'z') return term
    val sb = new StringBuilder(4)
    sb += term.charAt(0).toUpper
    var last = code(term.charAt(0))
    var i = 1
    while (i < term.length && sb.length < 4) {
      val ch = term.charAt(i)
      if (ch >= 'a' && ch <= 'z' && ch != 'h' && ch != 'w') {
        val c = code(ch)
        if (c != '0' && c != last) sb += c
        last = c
      }
      i += 1
    }
    while (sb.length < 4) sb += '0'
    sb.toString
  }

  /** The same encoding as a built-in Column chain (codegen; no UDF):
    *  1. strip h/w/digits from the tail (they never reset the run),
    *  2. map consonant classes to digits and vowels to '0',
    *  3. prepend the FIRST letter's code so a tail consonant equal in
    *     code to the first letter collapses into it (pfister -> P236),
    *  4. collapse adjacent equal codes (filter-with-index — no regex
    *     backreferences, so the DuckDB RE2 oracle can mirror it),
    *  5. drop the sentinel + zeros, truncate/pad to 4.
    */
  def encodeCol(tok: Column): Column = {
    val first = upper(substring(tok, 1, 1))
    val tail = regexp_replace(substring(tok, 2, 1000000), "[hw0-9]", "")
    val mapped = concat(
      translate(lower(first), "abcdefghijklmnopqrstuvwxyz",
        "01230120022455012623010202"),
      translate(tail,
        "bfpvcgjkqsxzdtlmnraeiouy", "111122222222334556000000"))
    val cs = split(mapped, "")
    // element_at is 1-based and rejects 0, so clamp the 0-based lambda
    // index with greatest(); the i===0 arm wins for the first element
    val collapsed = concat_ws("",
      filter(cs, (x, i) => i === 0 || x =!= element_at(cs, greatest(i, lit(1)))))
    val digits = regexp_replace(substring(collapsed, 2, 1000000), "0", "")
    when(tok.rlike("^[a-z]"),
      concat(first, rpad(substring(digits, 1, 3), 3, "0")))
      .otherwise(tok)
  }
}

/** Index-time phonetic filter (the reference's PhoneticFilter /
  * DoubleMetaphoneFilter / DaitchMokotoffSoundexFilter over the
  * commons-codec language encoders — the same public library the
  * reference delegates to, already on the Spark classpath).
  *
  * Encoders: `soundex` (the in-house validated implementation with its
  * codegen Column twin), `metaphone`, `dmetaphone` (primary + alternate,
  * DoubleMetaphoneFilter semantics), `rsoundex`, `caverphone`
  * (Caverphone 2.0), `cologne` (Kölner Phonetik), `nysiis`, and
  * `dmsoundex` (Daitch-Mokotoff with its `|`-separated branch codes).
  *
  * Position semantics follow each reference filter exactly: with
  * inject=true the original stays searchable at the same position (the
  * reference emits code-then-original for PhoneticFilter; original-first
  * for the DoubleMetaphone/DaitchMokotoff filters — mirrored, all at one
  * position); with inject=false the first code replaces the term and any
  * further codes stack as overlaps. A code that is empty or equal to the
  * term leaves the token untouched (PhoneticFilter.java:55-60). */
final case class PhoneticFilter(inject: Boolean = true,
                                encoder: String = "soundex") extends TokenFilter {
  import org.apache.commons.codec.language.{Metaphone, DoubleMetaphone,
    RefinedSoundex, Caverphone2, ColognePhonetic, Nysiis,
    DaitchMokotoffSoundex, MatchRatingApproachEncoder}

  /** term -> phonetic codes (empty = pass through). */
  @transient private lazy val codesOf: String => Seq[String] = encoder match {
    case "soundex" => t => Seq(Soundex.encode(t)).filter(_ != t)
    case "metaphone" =>
      val m = new Metaphone
      t => Seq(m.encode(t)).filter(c => c.nonEmpty && c != t)
    case "dmetaphone" =>
      val m = new DoubleMetaphone
      t => {
        val p = m.doubleMetaphone(t)
        val a = m.doubleMetaphone(t, true)
        if (p == null || p.isEmpty || p == t) Nil
        else if (a != null && a.nonEmpty && a != p) Seq(p, a)
        else Seq(p)
      }
    case "rsoundex" =>
      val m = new RefinedSoundex
      t => Seq(m.encode(t)).filter(c => c.nonEmpty && c != t)
    case "caverphone" =>
      val m = new Caverphone2
      t => Seq(m.encode(t)).filter(c => c.nonEmpty && c != t)
    case "cologne" =>
      val m = new ColognePhonetic
      t => Seq(m.encode(t)).filter(c => c.nonEmpty && c != t)
    case "nysiis" =>
      val m = new Nysiis
      t => Seq(m.encode(t)).filter(c => c.nonEmpty && c != t)
    case "dmsoundex" =>
      val m = new DaitchMokotoffSoundex
      t => m.soundex(t).split('|').toSeq.filter(_.nonEmpty)
    case "matchrating" =>
      val m = new MatchRatingApproachEncoder
      t => Seq(m.encode(t)).filter(c => c.nonEmpty && c != t)
    case other =>
      throw new IllegalArgumentException(s"unsupported phonetic encoder: $other")
  }

  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    tokens.indices.foreach { i =>
      val t = tokens(i)
      val codes = try codesOf(t.term) catch { case _: Exception => Nil }
      if (codes.isEmpty) { outT += t; outO += overlaps(i) }
      else if (inject) {
        outT += t; outO += overlaps(i)
        codes.foreach { c => outT += Token(c, t.pos); outO += true }
      } else {
        outT += Token(codes.head, t.pos); outO += overlaps(i)
        codes.tail.foreach { c => outT += Token(c, t.pos); outO += true }
      }
    }
    (outT.result(), outO.result())
  }
}
