package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkEdge
import graft.util.Hashing._

/** MinHash-LSH candidate blocking + exact Jaccard link scoring.
  *
  * Graft of the reference's two-phase overlap detection: KD-tree
  * blocking (/root/reference/src/OverlappingSegmentsUtils.jl:144-153)
  * followed by exact discrete-Fréchet scoring
  * (/root/reference/src/Utils.jl:256-276). Here the blocking is
  * MinHash banding over character shingles (Broder 1997; Leskovec et
  * al., "Mining of Massive Datasets" ch.3) and the exact scorer is
  * Jaccard over the same shingle sets.
  *
  * Scale shape: input is the *distinct surface vocabulary* (10^6-10^8
  * rows at 10^12-turn scale, NOT the turn stream). One narrow shuffle
  * on the (band, bandHash) key produces candidates; scoring is a
  * map-side exact check on the joined rows. Hot buckets (stopword-like
  * surfaces) are capped by the band hash width; AQE skew-join handles
  * residual skew.
  */
object Linker {

  final case class LshConfig(
      shingleK: Int = 3,
      // banding recall at the decision boundary: P(collide | s) =
      // 1-(1-s^r)^b = 0.98 at charJ s=0.53 (the weakest true pair:
      // abbreviation vs canonical) with b=24, r=3. r=3 matters beyond
      // recall: with r=2 the band slices of short names are dominated
      // by the corpus' most common word's shingles, producing giant
      // identical-slice buckets that the hot-bucket cap then drops —
      // observed as blocking misses at 2000+ entities. Requiring a
      // third agreeing min-hash shrinks those buckets exponentially.
      // with the deterministic prefix channel carrying the structured
      // variants, the MinHash channel only needs to catch residual
      // fuzzy pairs — 16x3 is the cost/recall sweet spot
      numBands: Int = 16,
      rowsPerBand: Int = 3,
      // tokenSim: same-entity variants score >= 0.9 (equality /
      // prefix-abbreviation per token); distinct entities <= ~0.3
      // (an unmatched informative token caps the min) — 0.6 sits in
      // the separation gap with wide margin on both sides
      jaccardThreshold: Double = 0.6,
      // hot-bucket cap: a band bucket holding > maxBucketSize surfaces
      // is a stopword-like collision (shared common token), not a
      // same-entity signal — its pair space is quadratic and its pairs
      // nearly all fail the exact scorer. Dropping such buckets is the
      // standard production-LSH skew mitigation; same-entity groups
      // are tiny (#variants), so true-pair recall is untouched as long
      // as the cap is comfortably above the variant count.
      maxBucketSize: Int = 64,
      seed: Long = 42L
  ) {
    def numHashes: Int = numBands * rowsPerBand
  }

  // precompiled (String.replaceAll/split compile their regex per call —
  // measurable in the pair-scoring hot loop)
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")
  private val NonAlnumPattern = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** Normalized character k-shingles. Case-folded and
    * whitespace-collapsed so case variants are shingle-identical.
    */
  def shingles(s: String, k: Int): Array[Long] = {
    val n = WsPattern.matcher(s.toLowerCase).replaceAll(" ").trim
    if (n.length < k) Array(hashString(n))
    else {
      val set = scala.collection.mutable.LongMap.empty[Unit]
      var i = 0
      while (i + k <= n.length) {
        set.update(hashString(n.substring(i, i + k)), ())
        i += 1
      }
      set.keys.toArray
    }
  }

  /** MinHash signature: one universal-hash permutation per slot. */
  def signature(sh: Array[Long], cfg: LshConfig): Array[Long] = {
    val sig = Array.fill(cfg.numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var p = 0
      while (p < cfg.numHashes) {
        val h = mix3(cfg.seed, p.toLong, sh(i))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  /** One LSH band key per band: a pure-Scala mix of the band's
    * signature slice. Shared by the distributed plan (precomputed in
    * the signing mapPartitions, posexploded) and the driver-local fast
    * path, so both produce IDENTICAL candidate buckets.
    */
  def bandKeys(sig: Array[Long], cfg: LshConfig): Array[Long] =
    Array.tabulate(cfg.numBands) { b =>
      var h = mix64(cfg.seed ^ (b + 1).toLong)
      var i = b * cfg.rowsPerBand
      val end = i + cfg.rowsPerBand
      while (i < end) { h = mix3(h, sig(i), i.toLong); i += 1 }
      h
    }

  def exactJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet
    var inter = 0
    var i = 0
    while (i < b.length) { if (sa.contains(b(i))) inter += 1; i += 1 }
    val union = sa.size + b.distinct.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** IDF-weighted Jaccard: sum of shingle weights over the
    * intersection / union. Downweights shingles that are frequent
    * across the vocabulary (e.g. the "Systems"/"Inc" suffix problem:
    * two orgs sharing only a common suffix score low; variants sharing
    * a rare first word score high). Standard record-linkage practice
    * (cf. Cohen et al., soft TF-IDF).
    */
  def weightedJaccard(
      a: Array[Long],
      b: Array[Long],
      w: Long => Double
  ): Double = {
    val sa = a.toSet
    val sb = b.toSet
    var inter = 0.0
    var union = 0.0
    for (s <- sa) { val x = w(s); union += x; if (sb.contains(s)) inter += x }
    for (s <- sb) if (!sa.contains(s)) union += w(s)
    if (union == 0) 1.0 else inter / union
  }

  /** Legal-form / article stop tokens — standard company-name
    * normalization (cf. Magellan/py_entitymatching, Dedupe.io docs).
    */
  val StopTokens: Set[String] =
    Set("the", "inc", "corp", "ltd", "llc", "co", "gmbh")

  def tokensOf(s: String): Array[String] =
    NonAlnumPattern.split(s.toLowerCase).filter(t => t.nonEmpty && !StopTokens(t))

  /** Entity-link score: MIN over informative tokens (both sides) of the
    * token's best match on the other side, where a token matches by
    * equality (1.0), prefix-abbreviation >= 4 chars (0.9, "Techn." vs
    * "Technologies"), or char-trigram Jaccard otherwise. The min
    * aggregation is the discriminating choice: one unmatched
    * informative token ("Falcon" vs "Yarrow") caps the score near 0
    * even when the rest of the name agrees — exactly the
    * shared-suffix confusable a plain bag-of-shingles Jaccard merges.
    * This is the Fréchet-tolerance slot of the reference
    * (/root/reference/src/Utils.jl:256-276): the exact scorer applied
    * after blocking.
    */
  def tokenSim(a: String, b: String): Double =
    tokenSimArr(tokensOf(a), tokensOf(b), collection.mutable.HashMap.empty)

  /** tokenSim over pre-split token arrays with a caller-provided
    * shingle memo (tokens repeat heavily across candidate pairs — a
    * per-partition memo removes ~all shingle recomputation).
    */
  def tokenSimArr(
      ta: Array[String],
      tb: Array[String],
      shingleMemo: collection.mutable.HashMap[String, Array[Long]]
  ): Double = {
    if (ta.isEmpty || tb.isEmpty) return if (ta.isEmpty && tb.isEmpty) 1.0 else 0.0
    def sh(t: String): Array[Long] = shingleMemo.getOrElseUpdate(t, shingles(t, 3))
    def one(t: String, other: Array[String]): Double = {
      var best = 0.0
      var i = 0
      while (i < other.length && best < 1.0) {
        val o = other(i)
        val s =
          if (t == o) 1.0
          else if (math.min(t.length, o.length) >= 4 &&
            (t.startsWith(o) || o.startsWith(t))) 0.9
          else exactJaccard(sh(t), sh(o))
        if (s > best) best = s
        i += 1
      }
      best
    }
    var mn = 1.0
    var i = 0
    while (i < ta.length) { mn = math.min(mn, one(ta(i), tb)); i += 1 }
    i = 0
    while (i < tb.length) { mn = math.min(mn, one(tb(i), ta)); i += 1 }
    mn
  }

  /** IDF weights over the vocabulary's shingles. The char-k-gram space
    * is tiny (<< 10^6 distinct even at 10^8 surfaces), so the DF table
    * is computed distributed and always collected + broadcast.
    */
  def idfWeights(
      spark: SparkSession,
      surfaces: DataFrame, // columns: surface: String
      cfg: LshConfig
  ): Map[Long, Double] = {
    import spark.implicits._
    val n = surfaces.count().toDouble
    surfaces
      .select($"surface".cast("string"))
      .as[String]
      .flatMap(s => shingles(s, cfg.shingleK).distinct)
      .groupByKey(identity)
      .count()
      .collect()
      .map { case (sh, df) => sh -> math.log(1.0 + n / df.toDouble) }
      .toMap
  }

  /** The deterministic second blocking channel (multi-pass blocking,
    * standard entity-resolution practice): keyed on (first informative
    * token, 2-char prefix of the second, trailing numeric token if
    * any). Abbreviation variants clip the second token, which thins
    * their shingle overlap right at the LSH recall edge — this channel
    * catches every prefix-compatible pair with probability 1. The
    * numeric-suffix component keeps name families ("X Systems 2..22")
    * from pooling into one bucket that the hot-bucket cap would drop;
    * same-entity variants always agree on it. A single-informative-
    * token surface ("Google") gets a degenerate-but-valid key (second
    * component folds to ""). Caller guarantees toks is non-empty.
    */
  def prefixKey(toks: Array[String]): Long = {
    val t2p = if (toks.length >= 2) toks(1).take(2) else ""
    val last = toks(toks.length - 1)
    val num = if (last.nonEmpty && last.forall(c => c >= '0' && c <= '9')) last else ""
    mix3(hashString(toks(0)), hashString(t2p), hashString(num))
  }

  /** All blocking keys of one surface: numBands MinHash band keys
    * (positions 0..numBands-1) plus the prefix-channel key (position
    * numBands) when the surface has informative tokens. Position = the
    * channel id; shared by the distributed and driver-local paths.
    */
  def blockingKeys(toks: Array[String], sig: Array[Long], cfg: LshConfig): Array[Long] = {
    val bands = bandKeys(sig, cfg)
    if (toks.isEmpty) bands else bands :+ prefixKey(toks)
  }

  /** Candidate link edges among `surfaces` (id, surface).
    *
    * Plan: one row per (surface, channel) with the channel's key
    * (computed in the signing mapPartitions — pure Scala, identical to
    * the driver-local fast path) → self equi-join on (band, bh) →
    * distinct (src < dst) pairs → exact scorer filter. The join is an
    * equi-join Catalyst plans as a shuffled hash join; the theta part
    * (score >= t) is a residual map-side filter — the same
    * broad/narrow split the reference hand-rolls.
    */
  def linkEdges(
      spark: SparkSession,
      surfaces: DataFrame, // columns: id: Long, surface: String
      cfg: LshConfig = LshConfig()
  ): Dataset[LinkEdge] = {
    import spark.implicits._

    val withKeys = surfaces
      .select($"id".cast("long"), $"surface".cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, s) =>
          // tokenize once per surface; pairs downstream reuse the arrays
          val toks = tokensOf(s)
          (id, toks, blockingKeys(toks, signature(shingles(s, cfg.shingleK), cfg), cfg))
        }
      }
      .toDF("id", "toks", "keys")

    val banded = withKeys
      .select($"id", $"toks", posexplode($"keys").as(Seq("band", "bh")))

    // drop hot buckets before the self-join (see maxBucketSize doc)
    val keepBuckets = banded
      .groupBy($"band", $"bh")
      .agg(count(lit(1)).as("sz"))
      .where($"sz" <= cfg.maxBucketSize && $"sz" > 1)
      .select($"band", $"bh")
    val pruned = banded.join(keepBuckets, Seq("band", "bh"), "left_semi")

    val l = pruned.select($"band", $"bh", $"id".as("src"), $"toks".as("t_a"))
    val r = pruned.select($"band", $"bh", $"id".as("dst"), $"toks".as("t_b"))

    val scored = l
      .join(r, Seq("band", "bh"))
      .where($"src" < $"dst")
      // a pair can collide in several bands — dedup before scoring so
      // the exact scorer runs once per pair
      .groupBy($"src", $"dst")
      .agg(first($"t_a").as("t_a"), first($"t_b").as("t_b"))
      .as[(Long, Long, Array[String], Array[String])]
      .mapPartitions { it =>
        val memo = collection.mutable.HashMap.empty[String, Array[Long]]
        it.map { case (s, d, a, b) => LinkEdge(s, d, tokenSimArr(a, b, memo)) }
      }
      .filter(_.score >= cfg.jaccardThreshold)

    scored
  }

  /** Driver-local linkEdges fast path for broadcast-sized vocabularies
    * (the reference's own in-memory regime; same dispatch idea as
    * [[graft.canon.ConnectedComponents]]' driver-local union-find). The
    * blocking keys, hot-bucket cap and scorer are the SAME functions
    * the distributed plan uses, so the produced link set is identical —
    * property-tested in LinkerLocalSpec. Replaces ~8 tiny Spark jobs
    * with one in-memory pass: at an 18M-turn/3.6k-surface proxy run the
    * distributed mapping cost ~3 s of fixed job overhead at 32 cores —
    * pure ceiling loss, since linking cost depends on |dict|, not
    * |turns|.
    */
  def linkEdgesLocal(
      surfaces: Seq[(Long, String)],
      cfg: LshConfig = LshConfig()
  ): Seq[LinkEdge] = {
    val n = surfaces.length
    val ids = new Array[Long](n)
    val toksArr = new Array[Array[String]](n)
    val buckets = collection.mutable.HashMap.empty[(Int, Long), collection.mutable.ArrayBuffer[Int]]
    var i = 0
    for ((id, s) <- surfaces) {
      ids(i) = id
      toksArr(i) = tokensOf(s)
      val keys = blockingKeys(toksArr(i), signature(shingles(s, cfg.shingleK), cfg), cfg)
      var b = 0
      while (b < keys.length) {
        buckets.getOrElseUpdate((b, keys(b)), collection.mutable.ArrayBuffer.empty) += i
        b += 1
      }
      i += 1
    }
    val pairs = collection.mutable.HashSet.empty[(Long, Long)]
    for ((_, buf) <- buckets if buf.size > 1 && buf.size <= cfg.maxBucketSize) {
      var a = 0
      while (a < buf.size) {
        var b = a + 1
        while (b < buf.size) {
          val (ia, ib) = (ids(buf(a)), ids(buf(b)))
          if (ia != ib) pairs += (if (ia < ib) (ia, ib) else (ib, ia))
          b += 1
        }
        a += 1
      }
    }
    val byId = surfaces.indices.map(j => ids(j) -> j).toMap
    val memo = collection.mutable.HashMap.empty[String, Array[Long]]
    pairs.toSeq.sortBy(identity).flatMap { case (src, dst) =>
      val score = tokenSimArr(toksArr(byId(src)), toksArr(byId(dst)), memo)
      if (score >= cfg.jaccardThreshold) Some(LinkEdge(src, dst, score)) else None
    }
  }
}
