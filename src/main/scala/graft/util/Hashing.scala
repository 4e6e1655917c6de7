package graft.util

/** Deterministic, seedable 64-bit hashing used everywhere randomness is
  * needed (transcript synthesis, MinHash families, salting). Pure
  * functions of their inputs so every stage is replayable on any
  * cluster size — the scale analog of the reference's fixed-seed test
  * fixtures. splitmix64 finalizer is public domain (Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14).
  */
object Hashing {

  /** splitmix64 finalizer: bijective 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Combine two longs into one hash. */
  @inline def mix2(a: Long, b: Long): Long = mix64(mix64(a) ^ b)

  /** Combine three longs. */
  @inline def mix3(a: Long, b: Long, c: Long): Long = mix64(mix2(a, b) ^ c)

  /** Stable 64-bit string hash (FNV-1a then mixed; NOT String.hashCode,
    * which is only 32-bit and collision-prone at 10^12 rows).
    */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Deterministic double in [0,1) from a hash. */
  @inline def toUnit(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble

  /** Deterministic int in [0, n) from a hash. */
  @inline def toRange(h: Long, n: Int): Int = {
    val m = h % n
    (if (m < 0) m + n else m).toInt
  }
}
