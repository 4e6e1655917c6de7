package graft.extract

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.kg.{Dictionary, SurfaceForm}
import graft.model.Turn

/** Mention span within one turn (conv/turn live on the parent row —
  * duplicating them per mention would re-encode the conv_id string
  * for every mention at 10^12-turn scale).
  */
final case class MentionSpan(entity_id: Long, surface: String, begin: Int, end: Int)

/** Raw triple within one turn (provenance on the parent row). */
final case class TripleSpan(subj: Long, pred: String, obj: Long)

/** Per-turn extraction result: mentions + the raw (surface-id) triples
  * asserted by the turn. Kept as one row per turn so a single
  * mapPartitions pass feeds both downstream consumers (linking needs
  * mentions; the edge table needs triples) without re-scanning text.
  */
final case class Extraction(
    conv_id: String,
    turn_idx: Int,
    mentions: Seq[MentionSpan],
    triples: Seq[TripleSpan]
)

/** Mention detection + triple extraction.
  *
  * Graft of the reference's enrichment join
  * (/root/reference/src/TCXParser.jl:188-203 road features;
  * consecutive-edge semantics /root/reference/src/GraphBuilder.jl:109-111
  * generalized to typed predicates): every turn is scanned once with a
  * broadcast Aho-Corasick trie; a triple is asserted when the text
  * between two adjacent mentions is exactly a predicate phrase.
  *
  * Scale notes: the trie is built once per partition (lazy val inside
  * the mapPartitions closure) from the broadcast surface array — no
  * per-row allocation; output is a narrow columnar row per turn. The
  * stage is embarrassingly parallel: no shuffle, order-independent.
  */
object Mentions {

  /** Predicate phrase -> predicate id lookup. */
  private val PhraseToPred: Map[String, String] =
    Dictionary.Predicates.map { case (id, phrase) => phrase -> id }.toMap

  @inline private def stripPunct(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && !Character.isLetterOrDigit(s.charAt(b))) b += 1
    while (e > b && !Character.isLetterOrDigit(s.charAt(e - 1))) e -= 1
    s.substring(b, e)
  }

  def extractTurn(ac: AhoCorasick, t: Turn): Extraction = {
    val ms = ac.findMentions(t.text)
    val mentions = new Array[MentionSpan](ms.length)
    var i = 0
    var cur = ms
    while (cur.nonEmpty) {
      val m = cur.head
      mentions(i) = MentionSpan(m.id, t.text.substring(m.begin, m.end), m.begin, m.end)
      i += 1
      cur = cur.tail
    }
    // adjacent mention pairs: between-text must be exactly a predicate
    // phrase (modulo surrounding whitespace) and contain no sentence
    // boundary — mirrors how the corpus renders assertions.
    var triples = List.empty[TripleSpan]
    i = mentions.length - 2
    while (i >= 0) {
      val a = mentions(i)
      val b = mentions(i + 1)
      val between = t.text.substring(a.end, b.begin)
      if (!between.contains('.') && !between.contains(',')) {
        PhraseToPred.get(stripPunct(between)) match {
          case Some(pred) => triples = TripleSpan(a.entity_id, pred, b.entity_id) :: triples
          case None =>
        }
      }
      i -= 1
    }
    Extraction(t.conv_id, t.turn_idx, mentions.toSeq, triples)
  }

  // One trie per (JVM, broadcast VALUE): the built trie is immutable, so
  // all tasks of an executor share it. Rebuilding per task/partition is
  // allocation-heavy enough (1 node-map per trie node) to invert
  // scaling at high core counts — 32 concurrent builds contend on the
  // allocator while 8 sail through.
  //
  // Keyed by the identity of the broadcast's VALUE array, not bc.id:
  // broadcast ids restart at 0 per SparkContext, so an id-keyed cache
  // silently serves the previous context's dictionary. The value array
  // is identity-stable per executor (block-manager cached) and weakly
  // held, so evicted broadcasts free their tries.
  private val trieCache =
    new java.util.WeakHashMap[Array[SurfaceForm], AhoCorasick]

  private def trieFor(bc: Broadcast[Array[SurfaceForm]]): AhoCorasick = {
    val surfaces = bc.value
    trieCache.synchronized {
      var t = trieCache.get(surfaces)
      if (t == null) {
        t = AhoCorasick.build(surfaces.map(s => (s.surface, s.surfaceId)))
        trieCache.put(surfaces, t)
      }
      t
    }
  }

  /** One-pass extraction over the corpus. `bcSurfaces` is the broadcast
    * dictionary (alias -> surface id).
    */
  def extract(
      spark: SparkSession,
      turns: Dataset[Turn],
      bcSurfaces: Broadcast[Array[SurfaceForm]]
  ): Dataset[Extraction] = {
    import spark.implicits._
    turns.mapPartitions { it =>
      val ac = trieFor(bcSurfaces)
      it.map(t => extractTurn(ac, t))
    }
  }

  /** Distinct surface ids observed anywhere in the corpus — the
    * vertices consumer's ONLY need from the turn stream. A dedicated
    * narrow pass: same trie scan, but no span/substring/triple
    * materialization, and per-partition dedup bounded by |dict| means
    * the map emits at most |dict| longs per partition (manual column
    * pruning — a typed full extraction can't be pruned by Catalyst).
    */
  def observedIds(
      spark: SparkSession,
      turns: Dataset[Turn],
      bcSurfaces: Broadcast[Array[SurfaceForm]]
  ): Dataset[Long] = {
    import spark.implicits._
    turns
      .mapPartitions { it =>
        val ac = trieFor(bcSurfaces)
        val seen = scala.collection.mutable.LongMap.empty[Unit]
        it.foreach { t =>
          if (t.text != null) {
            var ms = ac.findMentions(t.text)
            while (ms.nonEmpty) { seen.update(ms.head.id, ()); ms = ms.tail }
          }
        }
        seen.keysIterator
      }
      .distinct()
  }
}
