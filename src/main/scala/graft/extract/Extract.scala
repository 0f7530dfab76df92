package graft.extract

import graft.model.{Doc, Mention, RawTriple}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

/** Mention detection (SURVEY.md X4) + OpenIE-style triple extraction
  * (SURVEY.md X1/X2) — the Spark-native replacement for the reference's LLM
  * extraction oracle (/root/reference/kg-builder/internal/llm/llm.go:56-166).
  *
  * Both kernels run inside typed `mapPartitions` over `Dataset[Doc]`
  * (Catalyst object-mode — no RDD), with the two Aho-Corasick automata
  * (entity-alias dictionary and predicate grammar) broadcast once.
  *
  * Extraction rules, per text span (one sentence per span by corpus contract):
  *  - **dictionary path** (≥2 entity mentions, leftmost-longest
  *    non-overlapping): subj = first mention, obj = last mention, predicate =
  *    verbatim text between them. Endpoints are grounded — they skip the
  *    isValidConcept name gate exactly as the reference's already-known
  *    concepts do (validation applies to *candidates*, graph.go:268-283).
  *  - **open path** (<2 entity mentions but a predicate-grammar hit): the
  *    text before the first predicate hit is a candidate subject, the text
  *    after it a candidate object; whichever side carries the lone dictionary
  *    mention is grounded, the other is an ungrounded *candidate concept*
  *    that must pass isValidConcept downstream (mirrors the reference's BFS
  *    discovery of new concepts via LLM proposals).
  *
  * Media spans never produce triples; each extraction carries the media_ref of
  * the nearest preceding media span in the doc as provenance (north_star:
  * media spans carried as provenance edges).
  */
object Extract extends Serializable {

  private def trimPunct(s: String): String =
    s.dropWhile(c => c == ' ' || c == ',' || c == ';').reverse
      .dropWhile(c => c == ' ' || c == '.' || c == ',' || c == ';').reverse

  /** All dictionary mentions, for the mention-table output (X4). */
  def mentions(docs: Dataset[Doc], dict: Broadcast[AhoCorasick]): Dataset[Mention] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val ac = dict.value
      it.flatMap { d =>
        d.spans.iterator.zipWithIndex.flatMap { case (sp, idx) =>
          if (sp.kind != "text") Iterator.empty
          else ac.leftmostLongest(sp.text).iterator.map(h =>
            Mention(d.doc_id, idx, h.start, h.end, h.surface, h.surface))
        }
      }
    }
  }

  /** All boundary-valid dictionary hits (no leftmost-longest suppression) —
    * the mention-table surface whose semantics a relational engine can
    * reproduce with a word-boundary regex join. */
  def mentionsAll(docs: Dataset[Doc], dict: Broadcast[AhoCorasick]): Dataset[Mention] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val ac = dict.value
      it.flatMap { d =>
        d.spans.iterator.zipWithIndex.flatMap { case (sp, idx) =>
          if (sp.kind != "text") Iterator.empty
          else ac.findAll(sp.text).iterator.map(h =>
            Mention(d.doc_id, idx, h.start, h.end, h.surface, h.surface))
        }
      }
    }
  }

  /** Per-doc extraction kernel — shared verbatim by the Spark stage and the
    * bench's bare-thread host-capacity probe (same computation, zero
    * framework, so the probe measures the HOST's ceiling for this work). */
  def docTriples(d: Doc, ac: AhoCorasick, pc: AhoCorasick): Iterator[RawTriple] = {
    var lastMedia = ""
    d.spans.iterator.zipWithIndex.flatMap { case (sp, idx) =>
      if (sp.kind == "media") { lastMedia = sp.media_ref; Iterator.empty }
      else {
        val text = sp.text
        val ms = ac.leftmostLongest(text)
        if (ms.length >= 2) {
          val s = ms.head
          val o = ms.last
          val pred = text.substring(s.end, o.start).trim
          Iterator.single(RawTriple(d.doc_id, idx, s.surface, pred, o.surface,
            subj_grounded = true, obj_grounded = true, lastMedia, 1.0))
        } else {
          val ps = pc.leftmostLongest(text)
          if (ps.isEmpty) Iterator.empty
          else {
            val p = ps.head
            val m1 = ms.headOption
            val subjIsMention = m1.exists(_.end <= p.start)
            val objIsMention = m1.exists(_.start >= p.end)
            val subj =
              if (subjIsMention) m1.get.surface else trimPunct(text.substring(0, p.start))
            val obj =
              if (objIsMention) m1.get.surface else trimPunct(text.substring(p.end))
            if (subj.isEmpty || obj.isEmpty) Iterator.empty
            else Iterator.single(RawTriple(d.doc_id, idx, subj, p.surface, obj,
              subjIsMention, objIsMention, lastMedia, 0.8))
          }
        }
      }
    }
  }

  /** Raw triple extraction over a Dataset[Doc]. */
  def rawTriples(
      docs: Dataset[Doc],
      dict: Broadcast[AhoCorasick],
      predGrammar: Broadcast[AhoCorasick]): Dataset[RawTriple] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val ac = dict.value
      val pc = predGrammar.value
      it.flatMap(d => docTriples(d, ac, pc))
    }
  }

  def broadcastDict(spark: SparkSession, patterns: Iterable[String]): Broadcast[AhoCorasick] =
    spark.sparkContext.broadcast(AhoCorasick(patterns))

  /** Columnar raw-triple extraction — same semantics as [[rawTriples]], but
    * via the native [[ExtractTriplesExpr]] over the `spans` column: no
    * Doc/Span/String materialization, no RawTriple re-encode, and the whole
    * scan → extract → explode pipeline stays inside whole-stage codegen.
    * This is the throughput path Pipeline uses; the typed kernel remains the
    * reference implementation (bench host probes + parity specs call it).
    * Input must carry (doc_id, spans); output columns match
    * `rawTriples(...).toDF()` exactly. */
  def rawTriplesCols(
      docs: org.apache.spark.sql.DataFrame,
      dict: Broadcast[ByteAhoCorasick],
      preds: Broadcast[ByteAhoCorasick]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, explode}
    docs.select(col("doc_id"),
        explode(ExtractTriplesExpr.extractTriples(col("spans"), dict, preds)).as("t"))
      .select(col("doc_id"), col("t.span_idx"), col("t.subj"), col("t.pred"),
        col("t.obj"), col("t.subj_grounded"), col("t.obj_grounded"),
        col("t.media_ref"), col("t.conf"))
  }
}
