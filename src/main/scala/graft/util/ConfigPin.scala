package graft.util

import org.apache.spark.sql.SparkSession

/** Config fingerprint pinned next to a resumable output dir: the
  * bucket-ledger sinks ([[graft.graph.Materialize]]) key resume on
  * bucket id only, so a re-run against an existing output with
  * DIFFERENT flags or inputs would silently mix stale buckets with
  * audits from the new config — the pin turns that into a fail-fast.
  * First run records the fingerprint; every later run must match.
  */
object ConfigPin {

  def pin(spark: SparkSession, path: String, fingerprint: String, freshHint: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var n = in.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      in.close()
      val existing = buf.toString("UTF-8")
      require(existing == fingerprint,
        s"output at $path was written with a different config — resuming would mix stale " +
          s"buckets with new results; $freshHint.\n  have: $existing\n  want: $fingerprint")
    } else {
      // write-then-rename: a crash mid-write must not leave an
      // empty/truncated pin, which every later resume would read as
      // "written with a different config" — a misleading diagnosis for
      // an identical config
      val tmp = new org.apache.hadoop.fs.Path(path + "._tmp")
      val os = fs.create(tmp, true)
      os.write(fingerprint.getBytes("UTF-8"))
      os.close()
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        require(false, s"could not move config pin into place at $path")
      }
    }
  }
}
