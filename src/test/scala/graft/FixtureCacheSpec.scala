package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 content-strengthened cache-invalidation contract
  * (VERDICT r18 task 4): [[Tables.contentSig]] must discriminate a
  * same-length same-millisecond in-place regeneration — the hazard the
  * r18 length+mtime signatures could not see — and
  * [[Tables.cachedFixture]] (which now folds contentSig into its
  * per-file signature) must REBUILD on such a regeneration instead of
  * serving the stale tree. */
class FixtureCacheSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def tmpFile(name: String, bytes: Array[Byte]): java.io.File = {
    val dir = new java.io.File(Tables.scratch(spark, "fixsig", "spec"))
    dir.mkdirs()
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath, bytes)
    f
  }

  test("contentSig: same length+mtime, different boundary content => different sig") {
    // 10 KiB payload: head window [0,4096), tail window [n-4096,n)
    val base = Array.tabulate[Byte](10240)(i => (i % 251).toByte)
    val a = tmpFile("sig_a.bin", base)

    def variant(name: String, mutate: Array[Byte] => Unit): java.io.File = {
      val bytes = base.clone(); mutate(bytes)
      val v = tmpFile(name, bytes)
      assert(v.setLastModified(a.lastModified), s"mtime pin failed for $name")
      v
    }
    val headFlip = variant("sig_head.bin", b => b(100) = (b(100) ^ 0xff).toByte)
    val tailFlip = variant("sig_tail.bin", b => b(10239) = (b(10239) ^ 0xff).toByte)
    val copy = variant("sig_copy.bin", _ => ())

    assert(a.length == headFlip.length && a.lastModified == headFlip.lastModified)
    assert(Tables.contentSig(a) != Tables.contentSig(headFlip),
      "a head-window content change under identical length+mtime must change the sig")
    assert(Tables.contentSig(a) != Tables.contentSig(tailFlip),
      "a tail-window content change under identical length+mtime must change the sig")
    assert(Tables.contentSig(a) == Tables.contentSig(copy),
      "a byte-identical copy at identical length+mtime must collide (cache reuse)")
  }

  test("contentSig: sub-window and exact-window file sizes hash cleanly") {
    // < 4 KiB (head covers all, no tail read), exactly 4 KiB (boundary:
    // n > 4096 is false), and 4 KiB + 1 (tail reads exactly 1 byte) —
    // the RandomAccessFile seek/readFully edge cases.
    for (n <- Seq(10, 4096, 4097)) {
      val f = tmpFile(s"sig_n$n.bin", Array.fill[Byte](n)(7))
      val sig = Tables.contentSig(f)
      assert(sig.startsWith(s"$n:"), s"sig must lead with the length: $sig")
      // a last-byte flip is always visible, whichever window covers it
      val g = tmpFile(s"sig_n${n}_flip.bin",
        Array.fill[Byte](n)(7).updated(n - 1, 9.toByte))
      assert(g.setLastModified(f.lastModified))
      assert(Tables.contentSig(f) != Tables.contentSig(g),
        s"last-byte flip invisible at n=$n")
    }
  }

  test("contentSig: directory-shaped tables sign over their children") {
    // Spark writes parquet tables as DIRECTORIES (part files + _SUCCESS);
    // the spec fixtures' events.parquet takes that shape, so contentSig
    // must handle it (r19 regression: RandomAccessFile on a directory
    // threw FileNotFoundException) and must see through to child content
    val root = new java.io.File(Tables.scratch(spark, "dirsig", "spec"))
    def mkTable(name: String, payload: Byte): java.io.File = {
      val t = new java.io.File(root, name); t.mkdirs()
      java.nio.file.Files.write(new java.io.File(t, "part-00000").toPath,
        Array.fill[Byte](256)(payload))
      java.nio.file.Files.write(new java.io.File(t, "_SUCCESS").toPath,
        Array.empty[Byte])
      t
    }
    val a = mkTable("tbl_a.parquet", 1)
    val b = mkTable("tbl_b.parquet", 1)
    val sigA = Tables.contentSig(a)
    assert(sigA.startsWith("dir:2:"), s"directory sig shape: $sigA")
    assert(sigA == Tables.contentSig(a), "the dir sig must be stable")
    // a part-file content change (same length) must perturb the dir sig
    val part = new java.io.File(a, "part-00000")
    val mtime = part.lastModified
    java.nio.file.Files.write(part.toPath, Array.fill[Byte](256)(9))
    assert(part.setLastModified(mtime))
    assert(Tables.contentSig(a) != sigA,
      "a child content change under pinned length+mtime must change the dir sig")
    // an added child must perturb it too
    java.nio.file.Files.write(new java.io.File(b, "part-00001").toPath,
      Array.fill[Byte](16)(3))
    assert(!Tables.contentSig(b).startsWith("dir:2:"),
      "child count must be visible in the dir sig")
  }

  test("cachedFixture: a content-only in-place regeneration rebuilds the fixture") {
    // source dir with one file; the fixture records a build counter, so
    // serving a stale tree is observable as a stale counter value
    val srcDir = new java.io.File(Tables.scratch(spark, "fixrebuild", "src"))
    srcDir.mkdirs()
    val src = new java.io.File(srcDir, "data.bin")
    java.nio.file.Files.write(src.toPath, Array.fill[Byte](64)(1))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Int = {
      val dir = Tables.cachedFixture(spark, srcDir.getPath, "fixspec") { p =>
        val n = builds.incrementAndGet()
        java.nio.file.Files.write(
          new java.io.File(p, "counter").toPath, n.toString.getBytes)
      }
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "counter").toPath)).toInt
    }
    val first = run()
    assert(run() == first, "unchanged source must serve the cached tree")
    // regenerate in place: same length, same mtime, different content
    val mtime = src.lastModified
    java.nio.file.Files.write(src.toPath, Array.fill[Byte](64)(2))
    assert(src.setLastModified(mtime), "mtime pin failed")
    assert(src.length == 64 && src.lastModified == mtime)
    val second = run()
    assert(second != first,
      "same-length same-mtime content change served a STALE fixture tree")
    assert(run() == second, "the rebuilt tree must then be served warm")
    // self-clean: this spec's source dir is app-keyed (dead once the JVM
    // exits), so its fixcache trees would never be signature-evicted —
    // unlike real callers, whose sf paths are stable across runs
    val ph = Integer.toHexString(srcDir.getPath.hashCode)
    Option(new java.io.File("/dev/shm/graft_tmp").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("fixcache_") &&
        f.getName.contains(s"_${ph}_"))
      .foreach(Tables.deleteRec)
  }

  test("sharedFrame: rebinds on a content-only source regeneration, else serves warm") {
    val srcDir = new java.io.File(Tables.scratch(spark, "framerebind", "src"))
    srcDir.mkdirs()
    val src = new java.io.File(srcDir, "data.bin")
    java.nio.file.Files.write(src.toPath, Array.fill[Byte](64)(1))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Long = {
      val df = Tables.sharedFrame(spark, srcDir.getPath, "framespec") {
        spark.range(builds.incrementAndGet().toLong, 100L).toDF("id")
      }
      df.agg(org.apache.spark.sql.functions.min("id")).collect()(0).getLong(0)
    }
    val first = run()
    assert(run() == first, "unchanged source must serve the memoized frame")
    assert(builds.get == 1, s"build ran ${builds.get}x for an unchanged source")
    val mtime = src.lastModified
    java.nio.file.Files.write(src.toPath, Array.fill[Byte](64)(2))
    assert(src.setLastModified(mtime), "mtime pin failed")
    val second = run()
    assert(second != first && builds.get == 2,
      s"same-length same-mtime content change served a STALE shared frame " +
        s"(got $second after ${builds.get} builds)")
  }

  test("sharedFrame: a superseded entry's checkpointed RDD is eagerly unpersisted (r20)") {
    // r19 ADVICE: eviction used to only dereference the old entry,
    // leaving its localCheckpoint blocks to GC + ContextCleaner — a
    // mid-session regeneration could transiently hold two checkpointed
    // copies in storage memory. The entry now keeps the LogicalRDD
    // handle and unpersists it on supersede; pin that by watching
    // sparkContext.getPersistentRDDs across a rebind.
    val srcDir = new java.io.File(Tables.scratch(spark, "frameunpersist", "src"))
    srcDir.mkdirs()
    val src = new java.io.File(srcDir, "data.bin")
    java.nio.file.Files.write(src.toPath, Array.fill[Byte](64)(1))
    def persisted = spark.sparkContext.getPersistentRDDs.keySet
    val before = persisted
    val df1 = Tables.sharedFrame(spark, srcDir.getPath, "unpersistspec") {
      spark.range(100L).toDF("id")
    }
    df1.count() // materialize the lazy checkpoint (persists its RDD)
    val firstIds = persisted -- before
    assert(firstIds.nonEmpty,
      "the lazy localCheckpoint must persist an RDD once materialized")
    val mtime = src.lastModified
    java.nio.file.Files.write(src.toPath, Array.fill[Byte](64)(2))
    assert(src.setLastModified(mtime), "mtime pin failed")
    val df2 = Tables.sharedFrame(spark, srcDir.getPath, "unpersistspec") {
      spark.range(50L).toDF("id")
    }
    df2.count()
    val now = persisted
    assert(firstIds.forall(id => !now.contains(id)),
      s"superseded checkpoint RDD(s) ${firstIds.filter(now.contains)} still " +
        "persisted after the rebind — eager unpersist regressed to GC-reclaim")
  }

  test("sharedFrame: a build may itself call sharedFrame (r22, r21 ADVICE high)") {
    // hybridFused's build memoizes bm25ScoreU — a NESTED sharedFrame
    // call. The r21 form built inside ConcurrentHashMap.compute, which
    // forbids the remapping function from touching other mappings: two
    // keys landing in one hash bin threw IllegalStateException
    // ("Recursive update") or corrupted the bin, intermittently (bin
    // placement varies with the SparkSession identity hash per JVM).
    // Builds now run under per-key monitors outside any compute. Pin by
    // exercising MANY nested (outer → inner) pairs — enough entries that
    // the old form's same-bin nesting was near-certain — and re-reading
    // them warm.
    val srcDir = new java.io.File(Tables.scratch(spark, "framenested", "src"))
    srcDir.mkdirs()
    java.nio.file.Files.write(new java.io.File(srcDir, "data.bin").toPath,
      Array.fill[Byte](64)(7))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def outer(i: Int): Long = {
      val df = Tables.sharedFrame(spark, srcDir.getPath, s"nest_outer_$i") {
        val inner = Tables.sharedFrame(spark, srcDir.getPath, s"nest_inner_$i") {
          builds.incrementAndGet()
          spark.range(i.toLong, i + 10L).toDF("id")
        }
        inner.agg(org.apache.spark.sql.functions.sum("id")).toDF("s")
      }
      df.collect()(0).getLong(0)
    }
    val cold = (0 until 32).map(outer)
    val warm = (0 until 32).map(outer)
    assert(cold == warm, "nested shared frames drifted between cold and warm reads")
    assert(builds.get == 32, s"inner builds ran ${builds.get}x for 32 keys")
    (0 until 32).foreach { i =>
      assert(cold(i) == (i until i + 10).map(_.toLong).sum,
        s"nested build $i computed ${cold(i)}")
    }
  }

  test("contentSig: -Dgraft.contentSig.full=true closes the interior-bytes blind spot (r22)") {
    // The default signature reads only the first/last 4 KiB (plus
    // length+mtime) — a change confined to the interior with identical
    // boundaries is the DOCUMENTED residual blind spot (no parquet
    // writer produces one; the footer encodes interior stats/offsets).
    // VERDICT r20 task 3: a paranoid opt-in must digest every byte.
    val dir = new java.io.File(Tables.scratch(spark, "fullsig", "spec"))
    dir.mkdirs()
    val f = new java.io.File(dir, "blob.bin")
    val bytes = Array.tabulate[Byte](16384)(i => (i % 251).toByte)
    java.nio.file.Files.write(f.toPath, bytes)
    val mtime = f.lastModified
    val sigDefault1 = Tables.contentSig(f)
    System.setProperty("graft.contentSig.full", "true")
    val sigFull1 = try Tables.contentSig(f)
      finally System.clearProperty("graft.contentSig.full")
    // interior-only mutation: byte 8000 flips, boundaries/length/mtime pinned
    bytes(8000) = (bytes(8000) ^ 0x7f).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    assert(f.setLastModified(mtime), "mtime pin failed")
    val sigDefault2 = Tables.contentSig(f)
    System.setProperty("graft.contentSig.full", "true")
    val sigFull2 = try Tables.contentSig(f)
      finally System.clearProperty("graft.contentSig.full")
    assert(sigDefault1 == sigDefault2,
      "boundary-window mode unexpectedly saw an interior-only change — " +
        "blind-spot documentation (and this pin) need updating")
    assert(sigFull1 != sigFull2,
      "full-hash mode MISSED an interior-only content change")
    assert(sigFull1 != sigDefault1,
      "full-mode signatures must not collide with boundary-mode ones " +
        "(a mode flip must invalidate derived caches)")
  }

  test("dirSig/contentSig: delimiter characters in file names cannot forge a merge (r20)") {
    // r19 ADVICE: the signatures used to join entries as 'name:sig'
    // strings with '|', so a ':' or '|' INSIDE a name shifted field
    // boundaries; entries are now NUL-framed into the digest. Pin the
    // canonical shape and that delimiter-bearing names stay distinct
    // from their split-apart lookalikes.
    val root = new java.io.File(Tables.scratch(spark, "delimsig", "spec"))
    def mk(name: String, files: (String, Byte)*): java.io.File = {
      val d = new java.io.File(root, name); d.mkdirs()
      files.foreach { case (fn, b) =>
        java.nio.file.Files.write(new java.io.File(d, fn).toPath,
          Array.fill[Byte](32)(b))
      }
      d
    }
    val joined = mk("d_joined", ("a|b", 1))          // ONE file named "a|b"
    val split = mk("d_split", ("a", 1), ("b", 1))    // TWO files "a", "b"
    assert(Tables.contentSig(joined) != Tables.contentSig(split),
      "a '|' inside a file name merged two distinct listings")
    val colonName = mk("d_colon", ("x:32", 2))       // ':' inside the name
    val plainName = mk("d_plain", ("x", 2))
    assert(Tables.contentSig(colonName) != Tables.contentSig(plainName),
      "a ':' inside a file name merged two distinct listings")
    // dirSig emits the fixed-width digest form, never a raw concatenation
    val ds = Tables.dirSig(split.getPath)
    assert(ds.matches("dir:2:[0-9a-f]{32}"), s"dirSig shape: $ds")
  }

  test("contentSig: a missing source fails loud naming the signing context (r20)") {
    val ghost = new java.io.File(
      Tables.scratch(spark, "ghostsig", "spec"), "never_written.parquet")
    val e = intercept[RuntimeException](Tables.contentSig(ghost))
    assert(e.getMessage.contains("cache-signature source missing") &&
      e.getMessage.contains("never_written.parquet"),
      s"missing-source error must name the signing context and path: ${e.getMessage}")
  }
}
