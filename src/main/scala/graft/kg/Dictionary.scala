package graft.kg

import graft.util.Hashing._

/** One known surface form of an entity.
  *
  * @param surfaceId   globally unique id of THIS surface form (the
  *                    pre-canonicalization entity id)
  * @param canonicalId ground-truth canonical group (= min surfaceId of
  *                    the group); used only by tests/oracles — the
  *                    pipeline must rediscover it via LSH + scoring + CC
  * @param surface     the literal string as it appears in text
  * @param entityType  person | org | location | product | concept
  */
final case class SurfaceForm(
    surfaceId: Long,
    canonicalId: Long,
    surface: String,
    entityType: String
)

/** Deterministic entity dictionary + predicate lexicon.
  *
  * Graft of the reference's external enrichment sources (Overpass road
  * tags /root/reference/src/TCXParser.jl:153-181, weather dimension
  * :267-318): a broadcast side dictionary joined against the fact
  * stream. The surface space is a deterministic function of the ENTITY
  * INDEX alone (names/variants do not vary with the seed — the linking
  * hardness is structural, not sampled; the seed drives the turn
  * stream's contents instead), so the same dictionary rebuilds
  * identically on any executor at any scale.
  *
  * Each canonical entity gets several surface variants (case variant,
  * legal-suffix variant, single-char typo, abbreviation). Variants of
  * the same entity share most character 3-grams (Jaccard well above
  * 0.5); distinct entities draw from distinct word combinations
  * (Jaccard well below 0.3) — this separation is what makes the
  * LSH-blocked link-scoring join recover the grouping at P/R >= 0.95.
  */
object Dictionary {

  val Predicates: Vector[(String, String)] = Vector(
    "works_at" -> "works at",
    "located_in" -> "is located in",
    "partnered_with" -> "partnered with",
    "acquired" -> "acquired",
    "uses" -> "uses",
    "reports_to" -> "reports to",
    "member_of" -> "is a member of",
    "founded" -> "founded"
  )

  private val First = Vector(
    "Alder", "Birch", "Cobalt", "Delta", "Ember", "Falcon", "Granite",
    "Harbor", "Iris", "Juniper", "Krypton", "Lumen", "Meridian", "Nimbus",
    "Onyx", "Pinnacle", "Quartz", "Rowan", "Summit", "Tundra", "Obsidian",
    "Vertex", "Willow", "Xenon", "Yarrow", "Zephyr", "Atlas", "Borealis",
    "Cascade", "Drift", "Equinox", "Fjord", "Glacier", "Horizon"
  )
  // 5-char prefixes are all distinct (the abbreviation variant clips
  // the second word to 5 chars — distinct prefixes keep abbreviations
  // unambiguous; build() fail-fasts if a new word collides).
  private val Second = Vector(
    "Systems", "Dynamics", "Labs", "Analytics", "Networks", "Holdings",
    "Industries", "Partners", "Logistics", "Robotics", "Energy",
    "Materials", "Foundry", "Works", "Collective", "Institute", "Group",
    "Technologies", "Ventures", "Solutions", "Biosciences", "Optics",
    "Exchange", "Mills", "Terminal", "Observatory", "Archive", "Forge"
  )
  private val Types =
    Vector("person", "org", "location", "product", "concept")

  /** Number of surface variants per canonical entity. */
  val VariantsPerEntity = 4

  def canonicalName(seed: Long, e: Int): String = {
    // Unique word pair per entity: multiply by a unit mod First*Second
    // (gcd(331, 952) = 1) so consecutive entities don't share a first
    // word; pairs stay distinct for e < 952, then a numeric suffix
    // keeps names unique and shingle-distinct.
    val grid = First.size * Second.size
    val p = (e % grid) * 331 % grid
    val f = First(p / Second.size)
    val s = Second(p % Second.size)
    val sfx = if (e >= grid) " " + (e / grid + 2) else ""
    s"$f $s$sfx"
  }

  def entityType(e: Int): String = Types(e % Types.size)

  // surfacesOf is called per generated turn (hot in synthesis); the
  // variants of an entity are pure in (seed, e) -> memoize per JVM.
  private val surfaceCache =
    scala.collection.concurrent.TrieMap.empty[(Long, Int), Vector[SurfaceForm]]

  /** All surface variants of entity e. surfaceId = e*VariantsPerEntity+v.
    *
    * Deliberately NO typo variants: a hash-chosen typo of a shared
    * second word can coincide across entities ("Xenon Indutries" /
    * "Falcon Indutries"), and two entities sharing an identical rare
    * misspelling are indistinguishable to any string-only linker — the
    * fixture would contradict its own ground truth. The abbreviation is
    * the deliberately-hard fuzzy case instead.
    */
  def surfacesOf(seed: Long, e: Int): Vector[SurfaceForm] =
    surfaceCache.getOrElseUpdate((seed, e), surfacesOfUncached(seed, e))

  private def surfacesOfUncached(seed: Long, e: Int): Vector[SurfaceForm] = {
    val name = canonicalName(seed, e)
    val tpe = entityType(e)
    val canon = e.toLong * VariantsPerEntity // variant 0 is the canonical form
    val parts = name.split(' ')
    // Abbreviation must be unambiguous in running text: "Alder Dynam."
    // can only be the abbreviation (a sentence-final "Alder Dynamics."
    // tokenizes differently), but clipping a short word would reproduce
    // the full name + period — use a prefix variant instead then.
    // Numeric suffix tokens (names beyond the word-pair grid) must be
    // carried into the abbreviation: otherwise "Alder Systems" and
    // "Alder Systems 2" share the surface "Alder Syste." and the
    // dictionary itself would merge two distinct entities.
    val sfxTail = if (parts.length > 2) " " + parts.drop(2).mkString(" ") else ""
    val abbrev =
      if (parts(1).length >= 7) parts(0) + " " + parts(1).take(5) + "." + sfxTail
      else "The " + name
    val variants = Vector(
      name, // canonical
      name.toLowerCase, // case variant (shingle-identical after fold)
      abbrev,
      name + " Inc" // legal-suffix variant
    ).distinct
    variants.zipWithIndex.map { case (s, v) =>
      SurfaceForm(e.toLong * VariantsPerEntity + v, canon, s, tpe)
    }
  }

  /** The full dictionary for `numEntities` canonical entities. Small
    * enough to broadcast (the reference broadcasts its OSM tag
    * dictionary the same way conceptually); at 10^8-surface scale this
    * becomes a table and the trie is built per partition from a
    * broadcast join slice — the API below stays the same.
    */
  def build(seed: Long, numEntities: Int): Vector[SurfaceForm] = {
    val dict = (0 until numEntities).flatMap(e => surfacesOf(seed, e)).toVector
    // a duplicated surface string across entities makes the fixture
    // contradict its own ground truth — fail fast instead
    val dup = dict.groupBy(_.surface).collectFirst {
      case (s, vs) if vs.map(_.canonicalId).distinct.size > 1 => s
    }
    require(dup.isEmpty, s"dictionary surface collision across entities: '${dup.get}'")
    dict
  }
}
