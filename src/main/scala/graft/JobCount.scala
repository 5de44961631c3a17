package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Spark-job / stage counter per query key: `runMain graft.JobCount
  * <sfDir> <key>...` builds and fully executes each named
  * `SparkEntry.queries` entry under a registered SparkListener and
  * prints `key jobs=J stages=S` — the observable behind the r22
  * driver-loop optimizations (closure round-1 specialization, BPE lazy
  * checkpoint fusion), whose wins are jobs-per-key rather than
  * final-plan shape (the loops run at DataFrame-construction time, so
  * `explain` shows only the final assembly over checkpoint scans).
  * Counts include the jobs launched while CONSTRUCTING the frame (the
  * driver-side loops) plus the one materializing action. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, keys @ _*) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    })
    // WARM pass first (not printed): fixtures, shared frames and FS
    // caches prime exactly as in the bench's pass 1, so the printed
    // counts are the steady-state jobs a warm consumer pays.
    keys.foreach { k =>
      try SparkEntry.queries(k)(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"(warm $k failed: ${e.getMessage})") }
    }
    keys.foreach { k =>
      // let listener events from prior keys drain before snapshotting
      Thread.sleep(500) // listener bus is async; let events drain
      val j0 = jobs.get(); val s0 = stages.get()
      try {
        SparkEntry.queries(k)(spark, sfDir).queryExecution.toRdd.count()
        Thread.sleep(500) // listener bus is async; let events drain
        println(s"$k jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
      } catch { case e: Throwable => println(s"$k FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
