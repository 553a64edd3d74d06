package graft.analysis

/**
 * Indic / Arabic-script analysis components from the reference's
 * analysis-common language packages: HindiNormalizer + HindiStemmer
 * (Ramanathan & Rao's lightweight Hindi stemmer), BengaliNormalizer +
 * BengaliStemmer, the Larkey/Ballesteros/Connell Arabic light stemmer
 * (ar/ArabicStemmer.java — light10: definite-article prefixes and the
 * plural/feminine suffix chain, distinct from the Snowball Arabic
 * algorithm), and the PersianNormalizer.
 *
 * All Devanagari/Bengali/Arabic codepoints are written as explicit
 * unicode escapes: several of the table entries are nukta-precomposed
 * letters (U+0958-095F, U+09DC/09DD/09DF) that editors silently
 * NFD-decompose, which would change both match semantics and the
 * fixed drop counts.
 *
 * The normalizers do position-sensitive in-place rewrites with deletions
 * (lookbacks land on already-rewritten text), so they run over a small
 * mutable char buffer that mirrors the reference's (char[], len)
 * convention exactly; the stemmers are pure suffix/prefix tables.
 */
object IndicStemmers {

  /** Mutable (chars, len) view used by the normalizers. */
  private final class Buf(w: String) {
    val s: Array[Char] = new Array[Char](w.length)
    w.getChars(0, w.length, s, 0)
    var len: Int = w.length
    def delete(i: Int): Unit = {
      System.arraycopy(s, i + 1, s, i, len - i - 1); len -= 1
    }
    def result: String = new String(s, 0, len)
  }

  /** Hindi normalization (hi/HindiNormalizer.java): dead-n to bindu,
    * candrabindu to bindu, nukta forms folded, zwj/zwnj/virama dropped,
    * chandra and long vowels shortened. */
  object HindiNormalizer {
    def normalize(w: String): String = {
      val b = new Buf(w); val s = b.s
      var i = 0
      while (i < b.len) {
        s(i) match {
          case 'न' => // dead n -> bindu
            if (i + 1 < b.len && s(i + 1) == '्') {
              s(i) = 'ं'; b.delete(i + 1)
            }
          case 'ँ' => s(i) = 'ं' // candrabindu -> bindu
          case '़' => b.delete(i); i -= 1 // bare nukta
          case 'ऩ' => s(i) = 'न' // nukta-precomposed letters
          case 'ऱ' => s(i) = 'र'
          case 'ऴ' => s(i) = 'ळ'
          case 'क़' => s(i) = 'क'
          case 'ख़' => s(i) = 'ख'
          case 'ग़' => s(i) = 'ग'
          case 'ज़' => s(i) = 'ज'
          case 'ड़' => s(i) = 'ड'
          case 'ढ़' => s(i) = 'ढ'
          case 'फ़' => s(i) = 'फ'
          case 'य़' => s(i) = 'य'
          case '‍' | '‌' => b.delete(i); i -= 1 // zwj/zwnj
          case '्' => b.delete(i); i -= 1 // virama
          case 'ॅ' | 'ॆ' => s(i) = 'े' // chandra/short forms
          case 'ॉ' | 'ॊ' => s(i) = 'ो'
          case 'ऍ' | 'ऎ' => s(i) = 'ए'
          case 'ऑ' | 'ऒ' => s(i) = 'ओ'
          case 'ॲ' => s(i) = 'अ'
          case 'आ' => s(i) = 'अ' // long -> short independents
          case 'ई' => s(i) = 'इ'
          case 'ऊ' => s(i) = 'उ'
          case 'ॠ' => s(i) = 'ऋ'
          case 'ॡ' => s(i) = 'ऌ'
          case 'ऐ' => s(i) = 'ए'
          case 'औ' => s(i) = 'ओ'
          case 'ी' => s(i) = 'ि' // long -> short dependents
          case 'ू' => s(i) = 'ु'
          case 'ॄ' => s(i) = 'ृ'
          case 'ॣ' => s(i) = 'ॢ'
          case 'ै' => s(i) = 'े'
          case 'ौ' => s(i) = 'ो'
          case _ =>
        }
        i += 1
      }
      b.result
    }
  }

  /** Hindi light stemmer (hi/HindiStemmer.java — Ramanathan & Rao's
    * majority suffix table, longest first). */
  object HindiStem {
    private val suf5 = Seq("ाएंगी",
      "ाएंगे", "ाऊंगी",
      "ाऊंगा", "ाइयाँ",
      "ाइयों", "ाइयां")
    private val suf4 = Seq("ाएगी", "ाएगा",
      "ाओगी", "ाओगे",
      "एंगी", "ेंगी",
      "एंगे", "ेंगे",
      "ूंगी", "ूंगा",
      "ातीं", "नाओं",
      "नाएं", "ताओं",
      "ताएं", "ियाँ",
      "ियों", "ियां")
    private val suf3 = Seq("ाकर", "ाइए",
      "ाईं", "ाया", "ेगी",
      "ेगा", "ोगी", "ोगे",
      "ाने", "ाना", "ाते",
      "ाती", "ाता", "तीं",
      "ाओं", "ाएं", "ुओं",
      "ुएं", "ुआं")
    private val suf2 = Seq("कर", "ाओ", "िए",
      "ाई", "ाए", "ने", "नी",
      "ना", "ते", "ीं", "ती",
      "ता", "ाँ", "ां", "ों",
      "ें")
    private val suf1 = Seq("ो", "े", "ू", "ु",
      "ी", "ि", "ा")
    def stem(w: String): String = {
      val n = w.length
      if (n > 6 && suf5.exists(w.endsWith)) return w.dropRight(5)
      if (n > 5 && suf4.exists(w.endsWith)) return w.dropRight(4)
      if (n > 4 && suf3.exists(w.endsWith)) return w.dropRight(3)
      if (n > 3 && suf2.exists(w.endsWith)) return w.dropRight(2)
      if (n > 2 && suf1.exists(w.endsWith)) return w.dropRight(1)
      w
    }
    def stemNormalized(w: String): String = stem(HindiNormalizer.normalize(w))
  }

  /** Bengali normalization (bn/BengaliNormalizer.java) — the ya-phala /
    * ba-phala / visarga rewrites are index-sensitive over the mutating
    * buffer, mirrored exactly. */
  object BengaliNormalizer {
    def normalize(w: String): String = {
      val b = new Buf(w); val s = b.s
      var i = 0
      while (i < b.len) {
        s(i) match {
          case 'ঁ' => b.delete(i); i -= 1 // candrabindu
          case 'ী' => s(i) = 'ি' // long ii -> i
          case 'ূ' => s(i) = 'ু' // long uu -> u
          case 'ক' => // ka + virama + i-sign -> kha
            if (i + 2 < b.len && s(i + 1) == '্' && s(i + 2) == 'ি') {
              if (i == 0) {
                s(i) = 'খ'; b.delete(i + 2); b.delete(i + 1)
              } else {
                s(i + 1) = 'খ'; b.delete(i + 2)
              }
            }
          case 'ঙ' => s(i) = 'ং' // nga -> anusvara
          case 'য' => // ya-phala
            if (i - 2 == 0 && s(i - 1) == '্') {
              s(i - 1) = 'ে'
              if (i + 1 < b.len && s(i + 1) == 'া') b.delete(i + 1)
              b.delete(i); i -= 1
            } else if (i - 1 >= 0 && s(i - 1) == '্') {
              b.delete(i); b.delete(i - 1); i -= 2
            }
          case 'ব' => // ba-phala
            if (!((i >= 1 && s(i - 1) != '্') || i == 0)) {
              if (i - 2 == 0) {
                b.delete(i); b.delete(i - 1); i -= 2
              } else if (i - 5 >= 0 && s(i - 3) == '্') {
                b.delete(i); b.delete(i - 1); i -= 2
              } else if (i - 2 >= 0) {
                s(i - 1) = s(i - 2); b.delete(i); i -= 1
              }
            }
          case 'ঃ' => // visarga
            if (i == b.len - 1) {
              if (b.len <= 3) s(i) = 'হ' else { b.delete(i); i -= 1 }
            } else s(i) = s(i + 1)
          case 'শ' | 'ষ' => s(i) = 'স' // sha/ssa -> sa
          case 'ণ' => s(i) = 'ন' // nna -> na
          case 'ড়' | 'ঢ়' => s(i) = 'র' // rra forms -> ra
          case 'ৎ' => s(i) = 'ত' // khanda ta -> ta
          case _ =>
        }
        i += 1
      }
      b.result
    }
  }

  /** Bengali stemmer (bn/BengaliStemmer.java): verb-inflection and
    * plural/case suffix table, longest first. */
  object BengaliStem {
    private val suf8 = Seq(
      "িয়াছিলাম",
      "িতেছিলাম",
      "িতেছিলেন",
      "ইতেছিলেন",
      "িয়াছিলেন",
      "ইয়াছিলেন")
    private val suf7 = Seq(
      "িতেছিলি",
      "িতেছিলে",
      "িয়াছিলা",
      "িয়াছিলে",
      "িতেছিলা",
      "িয়াছিলি",
      "য়েদেরকে")
    private val suf6 = Seq(
      "িতেছিস",
      "িতেছেন",
      "িয়াছিস",
      "িয়াছেন",
      "েছিলাম",
      "েছিলেন",
      "েদেরকে")
    private val suf5 = Seq(
      "িতেছি", "িতেছা",
      "িতেছে", "ছিলাম",
      "ছিলেন", "িয়াছি",
      "িয়াছা", "িয়াছে",
      "েছিলে", "েছিলা",
      "য়েদের", "দেরকে")
    private val suf4 = Seq(
      "িলাম", "িলেন",
      "িতাম", "িতেন",
      "িবেন", "ছিলি",
      "ছিলে", "ছিলা",
      "তেছে", "িতেছ",
      "খানা", "খানি",
      "গুলো", "গুলি",
      "য়েরা", "েদের")
    private val suf3 = Seq(
      "লাম", "িলি", "ইলি",
      "িলে", "ইলে", "লেন",
      "িলা", "ইলা", "তাম",
      "িতি", "ইতি", "িতে",
      "ইতে", "তেন", "িতা",
      "িবা", "ইবা", "িবি",
      "ইবি", "বেন", "িবে",
      "ইবে", "ছেন", "য়োন",
      "য়ের", "েরা", "দের")
    private val suf2 = Seq(
      "িস", "েন", "লি", "লে",
      "লা", "তি", "তে", "তা",
      "বি", "বে", "বা", "ছি",
      "ছা", "ছে", "ুন", "ুক",
      "টা", "টি", "নি", "ের",
      "তে", "রা", "কে")
    private val suf1 = Seq("ি", "ী", "া", "ো",
      "ে", "ব", "ত")
    def stem(w: String): String = {
      val n = w.length
      if (n > 9 && suf8.exists(w.endsWith)) return w.dropRight(8)
      if (n > 8 && suf7.exists(w.endsWith)) return w.dropRight(7)
      if (n > 7 && suf6.exists(w.endsWith)) return w.dropRight(6)
      if (n > 6 && suf5.exists(w.endsWith)) return w.dropRight(5)
      if (n > 5 && suf4.exists(w.endsWith)) return w.dropRight(4)
      if (n > 4 && suf3.exists(w.endsWith)) return w.dropRight(3)
      if (n > 3 && suf2.exists(w.endsWith)) return w.dropRight(2)
      if (n > 2 && suf1.exists(w.endsWith)) return w.dropRight(1)
      w
    }
    def stemNormalized(w: String): String = stem(BengaliNormalizer.normalize(w))
  }

  /** Arabic normalization (ar/ArabicNormalizer.java): hamza-carrying alef
    * forms fold to bare alef, dotless yeh to yeh, teh marbuta to heh,
    * tatweel and harakat drop. */
  object ArabicNormalizer {
    def normalize(w: String): String = {
      val b = new StringBuilder(w.length)
      w.foreach {
        case 'آ' | 'أ' | 'إ' => b += 'ا' // alef forms
        case 'ى' => b += 'ي' // dotless yeh -> yeh
        case 'ة' => b += 'ه' // teh marbuta -> heh
        case 'ـ' => // tatweel
        case c if c >= 'ً' && c <= 'ْ' => // harakat
        case c => b += c
      }
      b.toString
    }
  }

  /** Arabic light stemmer (ar/ArabicStemmer.java — light10): one
    * definite-article/waw prefix (first match; waw needs a 4+ char word,
    * others need 2 chars left), then EVERY matching suffix in table order
    * with >= 2 chars kept. */
  object ArabicLight {
    private val prefixes = Seq(
      "ال",          // al-
      "وال",    // wal-
      "بال",    // bal-
      "كال",    // kal-
      "فال",    // fal-
      "لل",          // lil-
      "و")                // wa-
    private val suffixes = Seq(
      "ها", "ان", "ات", "ون",
      "ين", "يه", "ية", "ه",
      "ة", "ي")
    def stem(w: String): String = {
      var s = w
      prefixes.collectFirst {
        case p if s.startsWith(p) &&
          (if (p.length == 1) s.length >= 4 else s.length >= p.length + 2) => p
      }.foreach(p => s = s.drop(p.length))
      suffixes.foreach { suf =>
        if (s.length >= suf.length + 2 && s.endsWith(suf)) s = s.dropRight(suf.length)
      }
      s
    }
    def stemNormalized(w: String): String = stem(ArabicNormalizer.normalize(w))
  }

  /** Persian normalization (fa/PersianNormalizer.java): farsi yeh and yeh
    * barree to arabic yeh, keheh to kaf, heh-yeh/heh-goal to heh, hamza
    * above dropped. */
  object PersianNormalizer {
    def normalize(w: String): String = {
      val b = new StringBuilder(w.length)
      w.foreach {
        case 'ی' | 'ے' => b += 'ي' // farsi yeh / yeh barree
        case 'ک' => b += 'ك' // keheh -> kaf
        case 'ۀ' | 'ہ' => b += 'ه' // heh yeh / heh goal
        case 'ٔ' => // hamza above
        case c => b += c
      }
      b.toString
    }
  }
}
