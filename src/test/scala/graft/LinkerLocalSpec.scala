package graft

import graft.link.Linker

/** The driver-local linking fast path must produce the SAME link set as
  * the distributed plan — they share blockingKeys/scorer, so any drift
  * is a bug in one of the two plumbing layers.
  */
class LinkerLocalSpec extends SparkSpec {

  test("linkEdgesLocal == linkEdges on dictionary fixtures (several sizes/seeds)") {
    import spark.implicits._
    for ((seed, n) <- Seq((11L, 60), (42L, 200), (7L, 400))) {
      val dict = graft.kg.Dictionary.build(seed, n)
      val pairs = dict.map(s => (s.surfaceId, s.surface))
      val local = Linker
        .linkEdgesLocal(pairs)
        .map(e => (e.src, e.dst, e.score))
        .toSet
      val dictDf = spark.createDataset(pairs).toDF("id", "surface")
      val dist = Linker
        .linkEdges(spark, dictDf)
        .map(e => (e.src, e.dst, e.score))
        .collect()
        .toSet
      assert(local == dist,
        s"seed=$seed n=$n: localOnly=${(local diff dist).take(3)} distOnly=${(dist diff local).take(3)}")
      assert(local.nonEmpty, s"seed=$seed n=$n fixture produced no links")
    }
  }

  test("single-token surfaces link identically through the local path") {
    val surfaces = Seq((1L, "Google"), (2L, "Google Inc"), (3L, "Yarrow Systems"), (4L, "Yarrow Systems Inc"))
    val got = Linker.linkEdgesLocal(surfaces).map(e => (e.src, e.dst)).toSet
    assert(got.contains((1L, 2L)) && got.contains((3L, 4L)))
  }
}
