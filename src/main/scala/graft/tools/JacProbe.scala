package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
object JacProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val clipped = d.where(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), lit(1), greatest(size(split(col("text"), " ")) - 3, lit(1)))).as("text"))
    val corpus = d.union(clipped).cache(); corpus.count()
    def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"[jp] $n%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r }
    val base = corpus.select(col("doc_id").cast("long"), col("text").cast("string")).as[(Long, String)]
    val sh = base.map { case (id, tx) => (id, Dedup.wordShingles(tx, 3)) }.toDF("id","sh").cache()
    t("shingle+cache")(sh.count())
    val stats = sh.as[(Long, Array[Long])].map(_._2.length.toLong).toDF("n").agg(sum($"n"), avg($"n"), max($"n")).head()
    println("[jp] shingle stats " + stats)
    // hash-order prefix candidate volume
    val pref = sh.as[(Long, Array[Long])].flatMap { case (id, a) =>
      val s = a.sorted; val p = s.length - math.ceil(0.6 * s.length - 1e-9).toInt + 1
      s.iterator.take(math.max(p,1)).map(tok => (tok, id)) }.toDF("tok","id").cache()
    t("prefix rows")(println("[jp] prefix rows=" + pref.count()))
    val cand = pref.select($"tok", $"id".as("a")).join(pref.select($"tok", $"id".as("b")), Seq("tok")).where($"a" < $"b")
    t("raw candidates")(println("[jp] raw cand=" + cand.count()))
    t("distinct candidates")(println("[jp] distinct cand=" + cand.select($"a",$"b").distinct().count()))
    // frequency-ordered variant
    val freq = t("df map build")(sh.select(explode($"sh").as("s")).groupBy($"s").agg(count(lit(1)).as("df"))
      .where($"df" > 1).orderBy($"df".desc, $"s".asc).limit(1000000)
      .as[(Long, Long)].collect().toMap)
    println("[jp] df>1 shingles=" + freq.size)
    val bc = spark.sparkContext.broadcast(freq)
    val pref2 = sh.as[(Long, Array[Long])].flatMap { case (id, a) =>
      val f = bc.value
      val s = a.sortBy(x => (f.getOrElse(x, 1L), x)); val p = s.length - math.ceil(0.6 * s.length - 1e-9).toInt + 1
      s.iterator.take(math.max(p,1)).map(tok => (tok, id)) }.toDF("tok","id").cache()
    t("freq prefix rows")(println("[jp] freq prefix rows=" + pref2.count()))
    val cand2 = pref2.select($"tok", $"id".as("a")).join(pref2.select($"tok", $"id".as("b")), Seq("tok")).where($"a" < $"b")
    t("freq distinct candidates")(println("[jp] freq distinct cand=" + cand2.select($"a",$"b").distinct().count()))
    t("full jaccardPairsExact(freq=true)")(println("[jp] pairs=" + Dedup.jaccardPairsExact(spark, corpus, "doc_id", "text", 3, 0.6, frequencyOrdered = true).count()))
    t("full jaccardPairsExact(freq=false)")(println("[jp] pairs=" + Dedup.jaccardPairsExact(spark, corpus, "doc_id", "text", 3, 0.6, frequencyOrdered = false).count()))
    spark.stop()
  }
}
