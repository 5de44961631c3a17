package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-protocol behaviour of the custom DSv2 write connector (a10):
  * the read-back CONTENT is oracled; what needs pinning here is the
  * failure contract — an aborted job must not publish a commit marker,
  * and unsupported rows must fail loudly rather than corrupt a shard. */
class SinkSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(tag: String): String = {
    val d = s"/dev/shm/graft_tmp/sinkspec_${spark.sparkContext.applicationId}_$tag"
    new File(d).mkdirs()
    d
  }

  test("successful write publishes the job-commit marker and only final shards") {
    import spark.implicits._
    val dir = freshDir("ok")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .repartition(3)
      .write.format("graft.sources.CsvDirSink").option("path", dir)
      .mode("append").save()
    assert(new File(dir, "_graft_committed").exists(), "marker missing")
    val files = new File(dir).list().toSet
    assert(files.forall(f => f == "_graft_committed" || f.matches("part-\\d+\\.tsv")),
      s"stray files: $files")
    val back = spark.read.option("sep", "\t")
      .option("pathGlobFilter", "part-*.tsv")
      .schema("k LONG, v STRING").csv(dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("failed job publishes NO commit marker (abort path)") {
    import spark.implicits._
    val dir = freshDir("abort")
    val boom = udf((k: Long) => {
      if (k == 2L) throw new RuntimeException("planted task failure")
      k
    })
    intercept[Exception] {
      Seq(1L, 2L, 3L).toDF("k")
        .repartition(3)
        .select(boom(col("k")).as("k"))
        .write.format("graft.sources.CsvDirSink").option("path", dir)
        .mode("append").save()
    }
    assert(!new File(dir, "_graft_committed").exists(),
      "aborted job must not publish the commit marker")
  }

  test("nulls and unsupported types are rejected loudly") {
    import spark.implicits._
    val dirN = freshDir("nulls")
    val exN = intercept[Exception] {
      Seq(Some(1L), None).toDF("k")
        .write.format("graft.sources.CsvDirSink").option("path", dirN)
        .mode("append").save()
    }
    assert(exN.getMessage != null)
    val dirT = freshDir("types")
    intercept[Exception] {
      Seq(1).toDF("k") // IntegerType is not in the supported long/double/string set
        .write.format("graft.sources.CsvDirSink").option("path", dirT)
        .mode("append").save()
    }
    assert(!new File(dirT, "_graft_committed").exists())
  }
}
