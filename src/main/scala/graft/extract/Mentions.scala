package graft.extract

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.kg.{Dictionary, SurfaceForm}
import graft.model.{Mention, RawTriple, Turn}

/** Per-turn extraction result: mentions + the raw (surface-id) triples
  * asserted by the turn. Kept as one row per turn so a single
  * mapPartitions pass feeds both downstream consumers (linking needs
  * mentions; the edge table needs triples) without re-scanning text.
  */
final case class Extraction(
    conv_id: String,
    turn_idx: Int,
    mentions: Seq[Mention],
    triples: Seq[RawTriple]
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
    val mentions = ms.map(m =>
      Mention(t.conv_id, t.turn_idx, m.id, t.text.substring(m.begin, m.end), m.begin, m.end)
    )
    // adjacent mention pairs: between-text must be exactly a predicate
    // phrase (modulo surrounding whitespace) and contain no sentence
    // boundary — mirrors how the corpus renders assertions.
    val triples = mentions
      .sliding(2)
      .collect {
        case Seq(a, b) =>
          val between = t.text.substring(a.end, b.begin)
          if (!between.contains('.') && !between.contains(',')) {
            PhraseToPred.get(stripPunct(between)).map { pred =>
              RawTriple(a.entity_id, pred, b.entity_id, t.conv_id, t.turn_idx)
            }
          } else None
      }
      .flatten
      .toSeq
    Extraction(t.conv_id, t.turn_idx, mentions, triples)
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
      // Built once per partition; cost amortized over the partition.
      val ac = AhoCorasick.build(bcSurfaces.value.map(s => (s.surface, s.surfaceId)))
      it.map(t => extractTurn(ac, t))
    }
  }
}
