package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-pattern blocklist scanning with a real Aho–Corasick automaton —
  * the operator a content-policy / contamination pass needs when the
  * phrase list is large: a regex alternation of 10^5 phrases is
  * quadratic-ish and blows the pattern compiler, while Aho–Corasick scans
  * each document ONCE in O(len + matches) regardless of list size.
  *
  * Counting semantics are LEFTMOST NON-OVERLAPPING per pattern (each
  * pattern's next match must start at or after its previous match's end) —
  * the `indexOf`/`replace` convention, chosen precisely because an ANSI
  * SQL oracle can reproduce it per pattern with
  * `(len(t) − len(replace(t, p, ''))) / len(p)` while RE2 has no lookahead
  * for overlapping counts.
  *
  * Scale shape: the automaton builds ONCE on the driver from the phrase
  * list and ships inside the closure (broadcast by Spark's task
  * serialization); the corpus scan is one mapPartitions with zero
  * shuffles before the final per-source rollup.
  */
object Blocklist {

  /** Immutable Aho–Corasick automaton over exact phrase strings.
    * Dense-goto on a child map per node; BFS-built failure links; output
    * lists carry pattern indices. */
  final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty))
    private val goto_ = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = goto_(s).getOrElseUpdate(ch, {
          goto_ += scala.collection.mutable.Map.empty[Char, Int]
          out += Nil
          goto_.size - 1
        })
      }
      out(s) ::= pi
    }
    private val fail = new Array[Int](goto_.size)
    locally {
      val q = scala.collection.mutable.Queue.empty[Int]
      goto_(0).values.foreach { s => fail(s) = 0; q += s }
      while (q.nonEmpty) {
        val r = q.dequeue()
        goto_(r).foreach { case (ch, s) =>
          q += s
          // walk r's failure chain to the deepest proper suffix with a
          // ch-transition; its target (strictly shallower than s) is
          // s's failure state
          var f = fail(r)
          while (f != 0 && !goto_(f).contains(ch)) f = fail(f)
          fail(s) = goto_(f).getOrElse(ch, 0)
          out(s) = out(s) ++ out(fail(s))
        }
      }
    }
    private val gotoArr: Array[Map[Char, Int]] = goto_.map(_.toMap).toArray
    private val outArr: Array[List[Int]] = out.toArray
    private val patLen: Array[Int] = patterns.map(_.length).toArray

    /** Per-pattern leftmost-non-overlapping match counts in `text`. */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.size)
      val lastEnd = Array.fill(patterns.size)(0)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !gotoArr(s).contains(ch)) s = fail(s)
        s = gotoArr(s).getOrElse(ch, 0)
        var os = outArr(s)
        while (os.nonEmpty) {
          val pi = os.head
          val start = i + 1 - patLen(pi)
          if (start >= lastEnd(pi)) { counts(pi) += 1; lastEnd(pi) = i + 1 }
          os = os.tail
        }
        i += 1
      }
      counts
    }
  }

  /** Per-source blocklist report: documents hit, total hits, and the sum
    * of per-pattern hit counts weighted by pattern index (pins the exact
    * per-pattern distribution without a patterns × sources result). */
  def scanStats(spark: SparkSession, docs: DataFrame, idCol: String,
                textCol: String, srcCol: String,
                patterns: Seq[String]): DataFrame = {
    val ac = new AhoCorasick(patterns)
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("hits", LongType),
      StructField("weighted", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    docs.select(col(srcCol).cast("string"), col(textCol).cast("string"))
      .map { r =>
        val c = ac.countMatches(if (r.isNullAt(1)) "" else r.getString(1))
        var hits = 0L; var weighted = 0L
        var i = 0
        while (i < c.length) {
          hits += c(i); weighted += (i + 1) * c(i); i += 1
        }
        Row(r.getString(0), hits, weighted)
      }(enc)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum("hits").as("n_hits"),
        sum("weighted").as("weighted_hits"))
  }
}
