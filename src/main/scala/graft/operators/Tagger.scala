package graft.operators

import graft.analysis.{Analyzer, AnalyzerChain}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dictionary-driven text tagging — the Solr Text Tagger
 * (solr/core/src/java/org/apache/solr/handler/tagger/TaggerRequestHandler
 * .java: stream text against an FST dictionary of named phrases, emit
 * offsets of matches) re-expressed Spark-first: the dictionary compiles to
 * a broadcast token-trie and documents are tagged in ONE narrow pass (no
 * shuffle at all) — the 100 TB shape for entity extraction over a corpus.
 *
 * Overlap policies are the reference's (TagClusterReducer.java:38-101):
 *  - ALL: every dictionary match;
 *  - NO_SUB: drop tags contained inside another tag;
 *  - LONGEST_DOMINANT_RIGHT: repeatedly keep the longest remaining tag
 *    (character length, ties to the rightmost) and drop everything
 *    overlapping it.
 */
object Tagger {

  sealed trait Overlaps
  case object All extends Overlaps
  case object NoSub extends Overlaps
  case object LongestDominantRight extends Overlaps

  /** One emitted tag: token positions are inclusive, char offsets index the
    * original text (end exclusive). */
  final case class TagHit(startTok: Int, endTok: Int,
                          startChar: Int, endChar: Int, tag: String)

  private final class Node extends Serializable {
    val children = scala.collection.mutable.HashMap.empty[String, Node]
    var tags: List[String] = Nil
  }

  /** Compile (tag, phrase) entries into a token-trie — the FST-build
    * analogue. Phrases and text both analyze through the STANDARD chain
    * (the reference tagger likewise requires one shared field analyzer;
    * offsets come from the same stream). */
  private def buildTrie(dict: Seq[(String, String)], analyzer: AnalyzerChain): Node = {
    val root = new Node
    dict.foreach { case (tag, phrase) =>
      val toks = analyzer.terms(phrase)
      if (toks.nonEmpty) {
        var n = root
        toks.foreach(t => n = n.children.getOrElseUpdate(t, new Node))
        n.tags ::= tag
      }
    }
    root
  }

  /** All dictionary matches in one text (ALL policy), in (start, end) order. */
  private[operators] def matchAll(text: String, root: Node): Vector[TagHit] = {
    val toks = Analyzer.analyzeWithOffsets(text).toIndexedSeq
    val out = Vector.newBuilder[TagHit]
    var i = 0
    while (i < toks.length) {
      var n = root
      var j = i
      var go = true
      while (go && j < toks.length) {
        n.children.get(toks(j).term) match {
          case Some(c) =>
            c.tags.reverse.foreach(t =>
              out += TagHit(toks(i).pos, toks(j).pos, toks(i).start, toks(j).end, t))
            n = c; j += 1
          case None => go = false
        }
      }
      i += 1
    }
    out.result()
  }

  /** TagClusterReducer.NO_SUB: drop tags contained inside another tag. */
  private[operators] def reduceNoSub(tags: Vector[TagHit]): Vector[TagHit] =
    tags.filter(t => !tags.exists(p => p != t &&
      p.startChar <= t.startChar && p.endChar >= t.endChar &&
      (p.endChar - p.startChar) > (t.endChar - t.startChar)))

  /** TagClusterReducer.LONGEST_DOMINANT_RIGHT (TagClusterReducer.java:
    * 59-101): keep the longest unmarked tag (char length, ties to the
    * rightmost in offset order), remove unmarked overlaps, repeat. */
  private[operators] def reduceLdr(tags: Vector[TagHit]): Vector[TagHit] = {
    val alive = scala.collection.mutable.ArrayBuffer(tags.sortBy(t => (t.startChar, t.endChar)): _*)
    val marked = scala.collection.mutable.HashSet.empty[Int]
    var changed = true
    while (changed) {
      changed = false
      var best = -1
      for (k <- alive.indices) {
        if (!marked(k)) {
          val len = alive(k).endChar - alive(k).startChar
          if (best < 0 || len >= alive(best).endChar - alive(best).startChar) best = k
        }
      }
      if (best >= 0) {
        changed = true
        marked += best
        val b = alive(best)
        var k = 0
        while (k < alive.length) {
          val t = alive(k)
          if (!marked(k) && t.startChar < b.endChar && t.endChar > b.startChar) {
            alive.remove(k)
            // re-index marks above k
            val shifted = marked.filter(_ > k).map(_ - 1)
            marked.retain(_ < k)
            marked ++= shifted
          } else k += 1
        }
      }
    }
    alive.toVector
  }

  /**
   * Tag every document: returns (idCol, start_tok, end_tok, char_start,
   * char_end, tag). The dictionary rides as a broadcast trie; the pass is
   * narrow (zero exchanges — plan-audited like Monitor.matches).
   */
  def tagDocs(docs: DataFrame, idCol: String, textCol: String,
              dict: Seq[(String, String)],
              overlaps: Overlaps = LongestDominantRight): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val trie = spark.sparkContext.broadcast(buildTrie(dict, AnalyzerChain.standard))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val all = matchAll(text, trie.value)
        val kept = overlaps match {
          case All => all
          case NoSub => reduceNoSub(all)
          case LongestDominantRight => reduceLdr(all)
        }
        kept.sortBy(t => (t.startChar, t.endChar, t.tag)).iterator
          .map(t => (id, t.startTok, t.endTok, t.startChar, t.endChar, t.tag))
      }
      .toDF(idCol, "start_tok", "end_tok", "char_start", "char_end", "tag")
  }
}
