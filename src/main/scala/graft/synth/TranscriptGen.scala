package graft.synth

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.kg.{Dictionary, SurfaceForm}
import graft.model.Turn
import graft.util.Hashing._

/** Synthesis config. Defaults sized so sf-style scaling is linear in
  * `numConvs`.
  *
  * @param megaConvEvery every k-th conv is a mega-conversation (x25
  *                      turns) — exercises the skew path the north_rule
  *                      requires (cf. one ride = 10^5 points in the
  *                      reference corpus).
  */
final case class GenConfig(
    seed: Long = 42L,
    numConvs: Int = 200,
    numEntities: Int = 100,
    baseTurns: Int = 6,
    turnsJitter: Int = 18,
    megaConvEvery: Int = 97,
    megaFactor: Int = 25
)

/** Ground-truth triple with canonical (min-surface-id) entity ids. */
final case class ExpectedTriple(
    subj: Long,
    pred: String,
    obj: Long,
    conv_id: String,
    turn_idx: Int
)

/** Deterministic transcript corpus generator.
  *
  * Graft of the reference's TCX ingestion fixture
  * (/root/reference/src/TCXParser.jl:50-115): ordered records grouped
  * by session. Every row is a pure function of (seed, convIdx,
  * turnIdx), so generation is embarrassingly parallel (a flatMap over
  * `spark.range`) and identical at any parallelism — the property the
  * per-turn text-equality invariant is verified against.
  */
object TranscriptGen {

  private val Filler = Vector(
    "the", "team", "reviewed", "notes", "from", "yesterday", "and",
    "agreed", "on", "next", "steps", "for", "this", "quarter", "while",
    "tracking", "open", "items", "in", "detail", "before", "closing",
    "out", "remaining", "questions", "about", "timeline", "budget",
    "scope", "risks"
  )

  private val ToolNames =
    Vector("search", "calculator", "browser", "db_query", "code_run")

  final case class TurnContent(
      text: String,
      // (subjSurface, predId, objSurface) if this turn asserts a triple
      triple: Option[(SurfaceForm, String, SurfaceForm)],
      mentions: Vector[SurfaceForm]
  )

  def numTurnsOf(cfg: GenConfig, convIdx: Long): Int = {
    val n = cfg.baseTurns + toRange(mix3(cfg.seed, 0xc0L, convIdx), cfg.turnsJitter)
    if (cfg.megaConvEvery > 0 && convIdx % cfg.megaConvEvery == 0) n * cfg.megaFactor
    else n
  }

  def convId(convIdx: Long): String = {
    // manual zero-pad: String.format allocates a Formatter per call,
    // measurable at 10^7 turns/sec generation rates
    val d = convIdx.toString
    val sb = new java.lang.StringBuilder(13)
    sb.append("conv_")
    var i = d.length
    while (i < 8) { sb.append('0'); i += 1 }
    sb.append(d).toString
  }

  /** Zipf-ish skewed entity pick: cubing the uniform draw concentrates
    * mass on low entity indices (hot-entity head per FIXTURES.md §1).
    */
  private def pickEntity(cfg: GenConfig, h: Long): Int = {
    val u = toUnit(h)
    math.min(cfg.numEntities - 1, (u * u * u * cfg.numEntities).toInt)
  }

  private def pickSurface(cfg: GenConfig, e: Int, h: Long): SurfaceForm = {
    val ss = Dictionary.surfacesOf(cfg.seed, e)
    ss(toRange(h, ss.size))
  }

  private def fillerInto(sb: java.lang.StringBuilder, h0: Long, nMin: Int, nMax: Int): Unit = {
    val n = nMin + toRange(mix64(h0), nMax - nMin + 1)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Filler(toRange(mix2(h0, i.toLong), Filler.size)))
      i += 1
    }
  }

  /** Pure per-turn content: the single source of truth shared by the
    * distributed generator and the driver-local oracle.
    */
  def turnContent(cfg: GenConfig, convIdx: Long, turnIdx: Int): TurnContent = {
    val h = mix3(cfg.seed, convIdx, turnIdx.toLong)
    val wantTriple = toUnit(mix2(h, 1L)) < 0.45
    val wantLoneMention = toUnit(mix2(h, 2L)) < 0.25
    val sb = new java.lang.StringBuilder(192)

    if (wantTriple) {
      val eA = pickEntity(cfg, mix2(h, 5L))
      val eB0 = pickEntity(cfg, mix2(h, 6L))
      val eB = if (eB0 == eA) (eA + 1) % cfg.numEntities else eB0
      val sA = pickSurface(cfg, eA, mix2(h, 7L))
      val sB = pickSurface(cfg, eB, mix2(h, 8L))
      val (predId, phrase) =
        Dictionary.Predicates(toRange(mix2(h, 9L), Dictionary.Predicates.size))
      fillerInto(sb, mix2(h, 3L), 3, 8)
      sb.append(". ").append(sA.surface).append(' ').append(phrase)
        .append(' ').append(sB.surface).append(". ")
      fillerInto(sb, mix2(h, 4L), 2, 6)
      sb.append('.')
      TurnContent(sb.toString, Some((sA, predId, sB)), Vector(sA, sB))
    } else if (wantLoneMention) {
      val e = pickEntity(cfg, mix2(h, 10L))
      val s = pickSurface(cfg, e, mix2(h, 11L))
      fillerInto(sb, mix2(h, 3L), 3, 8)
      sb.append(' ').append(s.surface).append(' ')
      fillerInto(sb, mix2(h, 4L), 2, 6)
      sb.append('.')
      TurnContent(sb.toString, None, Vector(s))
    } else {
      fillerInto(sb, mix2(h, 3L), 3, 8)
      sb.append(' ')
      fillerInto(sb, mix2(h, 4L), 2, 6)
      sb.append('.')
      TurnContent(sb.toString, None, Vector.empty)
    }
  }

  def turnOf(cfg: GenConfig, convIdx: Long, turnIdx: Int): Turn = {
    val h = mix3(cfg.seed, convIdx, turnIdx.toLong)
    val c = turnContent(cfg, convIdx, turnIdx)
    val isTool = toRange(mix2(h, 20L), 7) == 0
    val role =
      if (isTool) "tool" else if (turnIdx % 2 == 0) "user" else "assistant"
    val tool =
      if (isTool) Some(ToolNames(toRange(mix2(h, 21L), ToolNames.size)))
      else None
    // base 2024-01-01T00:00:00Z; monotone non-decreasing within conv
    val ts = new Timestamp(1704067200000L + convIdx * 3600000L + turnIdx * 30000L)
    Turn(convId(convIdx), turnIdx, role, c.text, tool, ts)
  }

  /** Distributed corpus: flatMap over spark.range — no driver-side
    * materialization, scales to any numConvs.
    */
  def transcripts(spark: SparkSession, cfg: GenConfig): Dataset[Turn] = {
    import spark.implicits._
    spark
      .range(cfg.numConvs.toLong)
      .flatMap { convIdx =>
        (0 until numTurnsOf(cfg, convIdx)).iterator.map(t => turnOf(cfg, convIdx, t))
      }
  }

  /** Ground-truth triple set with canonical ids (min surface id of the
    * ground-truth group — the same convention the CC stage uses, so a
    * perfect pipeline reproduces these ids exactly).
    */
  def expectedTriples(spark: SparkSession, cfg: GenConfig): Dataset[ExpectedTriple] = {
    import spark.implicits._
    spark
      .range(cfg.numConvs.toLong)
      .flatMap { convIdx =>
        (0 until numTurnsOf(cfg, convIdx)).iterator.flatMap { t =>
          turnContent(cfg, convIdx, t).triple.map { case (sA, pred, sB) =>
            ExpectedTriple(sA.canonicalId, pred, sB.canonicalId, convId(convIdx), t)
          }
        }
      }
  }

  /** Driver-local corpus for small fixtures (streaming tests etc.). */
  def transcriptsLocal(cfg: GenConfig): Seq[Turn] =
    (0L until cfg.numConvs.toLong).flatMap { c =>
      (0 until numTurnsOf(cfg, c)).map(t => turnOf(cfg, c, t))
    }

  /** Driver-local oracle for small fixtures. */
  def expectedTriplesLocal(cfg: GenConfig): Vector[ExpectedTriple] =
    (0L until cfg.numConvs.toLong).toVector.flatMap { convIdx =>
      (0 until numTurnsOf(cfg, convIdx)).flatMap { t =>
        turnContent(cfg, convIdx, t).triple.map { case (sA, pred, sB) =>
          ExpectedTriple(sA.canonicalId, pred, sB.canonicalId, convId(convIdx), t)
        }
      }
    }
}
