package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.kg.Dictionary
import graft.link.Linker

/** Dev tool: stage timings + candidate volumes inside linkEdges. */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toInt).getOrElse(800)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[link] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val dict = Dictionary.build(42L, nEnt)
    println(s"[link] surfaces=${dict.size}")
    val cfg = Linker.LshConfig()
    val dictDf = spark.createDataset(dict.map(s => (s.surfaceId, s.surface))).toDF("id", "surface")

    val withSig = dictDf
      .select($"id".cast("long"), $"surface".cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, s) =>
          (id, Linker.tokensOf(s), Linker.signature(Linker.shingles(s, cfg.shingleK), cfg))
        }
      }
      .toDF("id", "toks", "sig")
      .persist()
    t("sign")(withSig.count())

    val banded = withSig
      .select($"id", $"toks",
        explode(expr(s"transform(sequence(0, ${cfg.numBands - 1}), " +
          s"b -> struct(b as band, hash(slice(sig, b * ${cfg.rowsPerBand} + 1, ${cfg.rowsPerBand}), b) as bh))")).as("bk"))
      .select($"id", $"toks", $"bk.band", $"bk.bh")
      .persist()
    t("banded")(println("[link] banded rows=" + banded.count()))

    val keep = banded.groupBy($"band", $"bh").agg(count(lit(1)).as("sz"))
      .where($"sz" <= cfg.maxBucketSize && $"sz" > 1)
    val pruned = banded.join(keep.select($"band", $"bh"), Seq("band", "bh"), "left_semi").persist()
    t("pruned")(println("[link] pruned rows=" + pruned.count()))

    val l = pruned.select($"band", $"bh", $"id".as("src"), $"toks".as("t_a"))
    val r = pruned.select($"band", $"bh", $"id".as("dst"), $"toks".as("t_b"))
    val raw = l.join(r, Seq("band", "bh")).where($"src" < $"dst")
    t("raw pair count")(println("[link] raw pairs=" + raw.count()))
    val dedup = raw.groupBy($"src", $"dst").agg(first($"t_a").as("t_a"), first($"t_b").as("t_b")).persist()
    t("dedup pairs")(println("[link] distinct pairs=" + dedup.count()))
    val scored = dedup
      .as[(Long, Long, Array[String], Array[String])]
      .mapPartitions { it =>
        val memo = collection.mutable.HashMap.empty[String, Array[Long]]
        it.map { case (s, d, a, b) => (s, d, Linker.tokenSimArr(a, b, memo)) }
      }
      .filter(_._3 >= cfg.jaccardThreshold)
    t("score+filter")(println("[link] links=" + scored.count()))
    spark.stop()
  }
}
