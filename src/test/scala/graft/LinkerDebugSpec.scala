package graft

import graft.kg.Dictionary
import graft.link.Linker

class LinkerDebugSpec extends SparkSpec {
  test("tokenSim separates same-entity from cross-entity pairs with margin") {
    // 500 entities spans most of the name grid — the breadth the sf0.1
    // bench dictionary actually uses
    val dict = Dictionary.build(42L, 500)
    var maxCross = 0.0
    var maxCrossPair = ""
    var minWithin = 1.0
    var minPair = ""
    for (a <- dict; b <- dict if a.surfaceId < b.surfaceId) {
      val j = Linker.tokenSim(a.surface, b.surface)
      if (a.canonicalId != b.canonicalId) {
        if (j > maxCross) { maxCross = j; maxCrossPair = s"'${a.surface}' <-> '${b.surface}'" }
      } else if (a.surfaceId == a.canonicalId && j < minWithin) {
        // connectivity-relevant: each variant's link to the canonical member
        minWithin = j; minPair = s"'${a.surface}' <-> '${b.surface}'"
      }
    }
    info(f"max cross-entity:      $maxCross%.3f  $maxCrossPair")
    info(f"min variant-to-canon:  $minWithin%.3f  $minPair")
    val t = Linker.LshConfig().jaccardThreshold
    assert(maxCross < t && t < minWithin, f"threshold $t outside gap ($maxCross%.3f, $minWithin%.3f)")
  }
}
