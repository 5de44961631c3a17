package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM (same confs as
  * Verify/Bench: UTC, nanos-as-long for events.parquet, small shuffle). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfTiny = "/root/testdata/sf0.001"

  /** Fresh per-call scratch dir UNDER the app-keyed tmpfs tree (so the
    * session shutdown hook reclaims it) — the spec replacement for
    * `Files.createTempDirectory`, whose /tmp dirs outlived the JVM and
    * accumulated on the throttled virtio disk across test runs. */
  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong()
  def tmpDir(prefix: String): String = {
    val d = new java.io.File(
      Tables.scratch(spark, prefix, "spectmp"),
      s"${prefix}_${tmpSeq.incrementAndGet()}")
    d.mkdirs()
    d.getPath
  }
}
