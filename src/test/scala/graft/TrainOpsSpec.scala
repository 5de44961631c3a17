package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioural pins for the SimHash near-dedup (l1). Since r15 l1 is
  * ALSO hash-oracled (md5-low-64 token hashes — DuckDB-computable; the
  * 4×16-bit banding is lossless for Hamming <= 3), so these tests guard
  * the properties a value-hash can't articulate: identical texts get
  * identical signatures (Hamming 0), exact-duplicate pairs land in one
  * cluster, and the near-dup relation stays far from all-pairs. */
class TrainOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val sfDup = "/root/testdata/sf0.1" // only tier with exact text dups

  test("l1: exact-duplicate texts share a simhash cluster") {
    val out = SparkEntry.queries("l1_dedup_simhash")(spark, sfDup)
    val docs = spark.read.parquet(s"$sfDup/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("dig"))
    val dupPairs = docs.as("a").join(docs.as("b"),
        col("a.dig") === col("b.dig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dupPairs.nonEmpty, "sf0.1 should contain exact dup texts")

    val rows = out.collect()
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sig = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    dupPairs.foreach { case (x, y) =>
      assert(sig(x) == sig(y), s"identical texts $x/$y differ in simhash")
      assert(cluster(x) == cluster(y), s"identical texts $x/$y not clustered")
    }
    // Degeneracy BAND (r17, VERDICT r16 task 6 — a one-sided <40% bound
    // was a materially weaker anti-collapse guard): the merge rate is
    // hash-family-calibrated — this corpus draws ~50-token docs from a
    // ~31-word vocabulary, so SimHash margins are small and the
    // Hamming<=3 component volume swings with the family (xxhash64
    // merged ~9% of sf0.1 docs; the r15 md5-low-64 family — adopted so
    // DuckDB can recompute the signature exactly — merges ~22%, every
    // pair of which the oracle verifies bit-exactly). Pin a band around
    // that measured ~22%: >32% smells of banding collapse, <12% of an
    // unintended hash-family/threshold change (xxhash's 9% would trip
    // it), both of which the value-hash oracle alone can't attribute.
    val merged = rows.count(r => r.getLong(0) != r.getLong(2))
    assert(merged < rows.length * 32 / 100,
      s"$merged of ${rows.length} docs marked near-dup (>32%) — degenerate banding")
    assert(merged > rows.length * 12 / 100,
      s"$merged of ${rows.length} docs marked near-dup (<12%) — merge rate " +
        "far below the md5-low-64 family's measured ~22%: hash family or " +
        "threshold changed without recalibrating this band")
  }

  test("l1: a >=65536-token doc computes a signature (r22 — the r21 envelope raised here)") {
    // VERDICT r21 task 1: the 4×16-bit packed vote raise_error'd on any
    // doc with >= 2^16 tokens (and ANSI-overflowed from 2^15 — r21
    // ADVICE), yet a 65k-token document is entirely plausible at corpus
    // scale. The 2×32-bit packing must return the exact majority-vote
    // signature instead. Drive the vote kernel with one synthetic
    // 70,000-token doc (plus a small sibling, so the aggregation sees
    // more than one group) and compare against a bit-by-bit reference
    // computed in plain Scala from the same hash stream.
    import spark.implicits._
    val rnd = new scala.util.Random(0xb16d0cL)
    val hashes = Array.fill(70000)(rnd.nextLong())
    def referenceSig(hs: Array[Long]): Long = {
      val n = hs.length
      (0 until 64).map { i =>
        val ones = hs.count(h => ((h >>> i) & 1L) == 1L)
        if (2L * ones > n) 1L << i else 0L
      }.sum // disjoint bits
    }
    val small = Array.fill(37)(rnd.nextLong())
    val toks = (hashes.map(h => (1L, h)) ++ small.map(h => (2L, h)))
      .toSeq.toDF("doc_id", "h")
    val got = operators.TrainOps.simhashVotes(toks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == referenceSig(hashes),
      f"70k-token doc signature ${got(1L)}%x != reference ${referenceSig(hashes)}%x")
    assert(got(2L) == referenceSig(small),
      f"37-token doc signature ${got(2L)}%x != reference ${referenceSig(small)}%x")
  }

  test("broadcast guard fails loudly past MaxBroadcastRows, passes under it") {
    val big = spark.range(operators.LlmOps.MaxBroadcastRows + 1).toDF("vec_id")
    val ex = intercept[IllegalArgumentException] {
      operators.LlmOps.requireBroadcastable(big, "test table", "the-scale-path")
    }
    assert(ex.getMessage.contains("the-scale-path"),
      s"guard message must point at the scale path: ${ex.getMessage}")
    val ok = spark.range(10).toDF("vec_id")
    assert(operators.LlmOps.requireBroadcastable(ok, "t", "p") eq ok,
      "in-cap side must pass through unchanged")
  }

  test("l12: planted cosine near-dups cluster with high recall; chains close; strangers stay apart") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // exact geometry via plane rotation: A = u, B = rot(t), C = rot(2t) in
    // the u-w plane, so cos(A,B) = cos(B,C) = cos(t) and cos(A,C) = cos(2t)
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def orthTo(u: Array[Double]): Array[Double] = {
      val w0 = unit()
      val d = u.zip(w0).map { case (a, b) => a * b }.sum
      val w = w0.zip(u).map { case (a, b) => a - d * b }
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(_ / n)
    }
    def rot(u: Array[Double], w: Array[Double], t: Double): Seq[Float] =
      u.zip(w).map { case (a, b) => (math.cos(t) * a + math.sin(t) * b).toFloat }.toSeq

    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    // chain: cos(t) ≈ 0.985 >= 0.98 per hop, cos(2t) ≈ 0.94 < 0.98 across
    val t = math.acos(0.985)
    val cu = unit(); val cw = orthTo(cu)
    rows += ((0L, rot(cu, cw, 0))); rows += ((1L, rot(cu, cw, t)))
    rows += ((2L, rot(cu, cw, 2 * t)))
    // 20 planted near-dup pairs at cos ≈ 0.995
    val tp = math.acos(0.995)
    for (k <- 0 until 20) {
      val u = unit(); val w = orthTo(u)
      rows += ((1000L + 2 * k, rot(u, w, 0)))
      rows += ((1001L + 2 * k, rot(u, w, tp)))
    }
    // 50 unrelated vectors (random 64-d cosines stay far below 0.98)
    for (i <- 0 until 50) rows += ((100L + i, unit().map(_.toFloat).toSeq))

    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val df = spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava, schema)
    val out = operators.TrainOps.embeddingNearDups(df, 0.98).collect()
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap

    // chain closure: A~B and B~C must put A and C in ONE cluster even
    // though cos(A,C) < threshold
    assert(cluster(0L) == cluster(1L) && cluster(1L) == cluster(2L),
      s"chain not closed: ${cluster(0L)}/${cluster(1L)}/${cluster(2L)}")
    // recall over the planted pairs (SRP banding: expected ~0.999 each)
    val hit = (0 until 20).count(k => cluster(1000L + 2 * k) == cluster(1001L + 2 * k))
    assert(hit >= 18, s"planted-pair recall $hit/20 below 0.9")
    // precision: unrelated vectors must stay singletons
    val strangers = out.filter(_.getLong(0) >= 100L).filter(_.getLong(0) < 1000L)
    assert(strangers.forall(r => r.getLong(1) == r.getLong(0) && r.getLong(2) == 0L),
      "an unrelated vector was merged into a near-dup cluster")
  }

  test("l3: trained quantizer recovers recall on clustered data where first-16 init fails") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // The real IVF failure mode is a DOMINANT UNPROBED CELL, and it is
    // geometric, not random: because assignment and probing use the same
    // metric, a neighbour of q usually ranks cells the way q does — so to
    // lose recall the neighbourhood must sit in a cell the query's top-4
    // misses. Construction: the 16 init vectors (ids 0..15) form a ring
    // around the query direction uB, ALL at angle 0.5 rad (cos(q, cent_i)
    // ties at 4 dp for every i, so the probe tie-breaks to cells 0,1,2,3)
    // — while every true neighbour leans toward ring direction w_7, so
    // the whole neighbourhood quantizes into cell 7. Untrained recall is
    // 0. Two Lloyd rounds pull cell 7's centroid into the B cluster's
    // center, the tie breaks upward, and the probe finds the mass.
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def gramSchmidt(base: Seq[Array[Double]]): Array[Double] = {
      var w = unit()
      for (u <- base) {
        val d = u.zip(w).map { case (a, b) => a * b }.sum
        w = w.zip(u).map { case (a, b) => a - d * b }
      }
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(_ / n)
    }
    def rot(u: Array[Double], w: Array[Double], t: Double): Seq[Float] =
      u.zip(w).map { case (a, b) => (math.cos(t) * a + math.sin(t) * b).toFloat }.toSeq

    val uB = unit()
    // 16 mutually orthogonal ring directions, all orthogonal to uB
    val ring = (0 until 16).foldLeft(Vector(uB))((acc, _) => acc :+ gramSchmidt(acc)).tail
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    for (i <- 0 until 16) rows += ((i.toLong, rot(uB, ring(i), 0.5)))
    // cluster B: query = uB exactly; 30 members at 0.05..0.3 rad from uB,
    // each leaning toward ring(7) (plus noise), so argmax_i(v·w_i) = 7
    val qId = 999L
    rows += ((qId, uB.map(_.toFloat).toSeq))
    for (k <- 0 until 30) {
      val g = gramSchmidt(Vector(uB))
      val v0 = ring(7).zip(g).map { case (a, b) => a + 0.3 * b }
      val n = math.sqrt(v0.map(x => x * x).sum)
      rows += ((100L + k, rot(uB, v0.map(_ / n), 0.05 + 0.25 * rnd.nextDouble())))
    }
    // 20 unrelated distractors (random 64-d units stay near-orthogonal)
    for (k <- 0 until 20) rows += ((300L + k, unit().map(_.toFloat).toSeq))

    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val df = spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava, schema)
    val e = df.withColumn("norm",
      sqrt(functions.VectorFunctions.floatDot(col("embedding"), col("embedding"))))

    // exact top-10 by cosine, computed in-process from the same fixture
    val q = rows.find(_._1 == qId).get._2.map(_.toDouble).toArray
    def cos(v: Seq[Float]): Double = {
      val a = v.map(_.toDouble).toArray
      val dot = a.zip(q).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum))
    }
    val exact = rows.filter(_._1 != qId)
      .map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet

    def topAt(iters: Int): Set[Long] = operators.TrainOps
      .ivfTopK(e, e, qId, iters, nprobe = 4, k = 10)
      .collect().map(_.getLong(0)).toSet
    def recall(got: Set[Long]): Double = (got & exact).size.toDouble / exact.size
    val untrained = recall(topAt(0))
    val at2 = topAt(2)
    assert(untrained < 0.9,
      s"fixture not adversarial: first-16 quantizer already at recall $untrained")
    assert(recall(at2) >= 0.9,
      s"trained quantizer recall ${recall(at2)} < 0.9 (untrained was $untrained)")
    // deep-iteration lineage guard (r9): the per-round localCheckpoint in
    // ivfCentroids must keep the trainer plannable at any iters — this run
    // completes in bounded time (it hung planning-side before the cut) and
    // the converged quantizer still probes the same neighbourhood
    val at8 = topAt(8)
    assert(recall(at8) >= 0.9, s"iters=8 recall ${recall(at8)} < 0.9")
    assert(at8 == at2,
      s"k-means drifted between iters 2 and 8 on a converged fixture: " +
        s"${(at8 diff at2) ++ (at2 diff at8)}")
  }

  test("l31: SemDeDup catches same-cell near-dups, misses the cross-cell pair — the recall trade-off, measured") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Geometry: 16 mutually orthogonal init directions d_0..d_15 (ids
    // 0..15 = the trainer's init). Same-cell pair: ids 100/101 within
    // 0.03 rad of d_3 (mutual cos ≈ 0.9993, cos to d_3 ≥ 0.9996) — all
    // three quantize to cell 3 and the pair stage must find them.
    // Cross-cell pair: ids 200/201 on the d_5/d_6 bisector, rotated
    // ±0.12 rad toward d_5 resp. d_6 (mutual cos(0.24) ≈ 0.9713 ≥ the
    // 0.95 spec threshold) — they straddle the cell boundary BY
    // CONSTRUCTION, so cell-scoped SemDeDup cannot form the pair. That
    // miss is the algorithm's documented recall trade-off, not a bug.
    val rnd = new scala.util.Random(31)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def gramSchmidt(base: Seq[Array[Double]]): Array[Double] = {
      var w = unit()
      for (u <- base) {
        val d = u.zip(w).map { case (a, b) => a * b }.sum
        w = w.zip(u).map { case (a, b) => a - d * b }
      }
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(_ / n)
    }
    def rot(u: Array[Double], w: Array[Double], t: Double): Seq[Float] =
      u.zip(w).map { case (a, b) => (math.cos(t) * a + math.sin(t) * b).toFloat }.toSeq

    val dirs = (0 until 16).foldLeft(Vector.empty[Array[Double]])((acc, _) =>
      acc :+ gramSchmidt(acc))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    for (i <- 0 until 16) rows += ((i.toLong, dirs(i).map(_.toFloat).toSeq))
    rows += ((100L, rot(dirs(3), gramSchmidt(Vector(dirs(3))), 0.02)))
    rows += ((101L, rot(dirs(3), gramSchmidt(Vector(dirs(3))), 0.03)))
    val bis = dirs(5).zip(dirs(6)).map { case (a, b) => (a + b) / math.sqrt(2.0) }
    val o56 = dirs(5).zip(dirs(6)).map { case (a, b) => (a - b) / math.sqrt(2.0) }
    rows += ((200L, rot(bis, o56, 0.12)))  // leans d_5 -> cell 5
    rows += ((201L, rot(bis, o56, -0.12))) // leans d_6 -> cell 6
    for (k <- 0 until 10) rows += ((300L + k, unit().map(_.toFloat).toSeq))

    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val df = spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava, schema)
    val e = df.withColumn("norm",
      sqrt(functions.VectorFunctions.floatDot(col("embedding"), col("embedding"))))

    val out = operators.TrainOps.semDedupCells(e, e, iters = 2, thresh = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(4))).toMap
    def cell(id: Long) = out(id)._1
    def dupOf(id: Long) = out(id)._2
    def keep(id: Long) = out(id)._3

    // fixture validity: the cross pair really is similar AND really straddles
    def cos(a: Long, b: Long): Double = {
      val va = rows.find(_._1 == a).get._2.map(_.toDouble).toArray
      val vb = rows.find(_._1 == b).get._2.map(_.toDouble).toArray
      va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
    }
    assert(cos(200L, 201L) >= 0.95, s"cross pair cos ${cos(200L, 201L)} under threshold")
    assert(cell(200L) != cell(201L),
      s"fixture not adversarial: bisector pair landed in one cell ${cell(200L)}")

    // same-cell near-dups caught; canonical survivor = smallest id (= d_3)
    assert(cell(100L) == cell(3L) && cell(101L) == cell(3L),
      "planted near-dups must quantize with their anchor d_3")
    assert(keep(3L), "the smallest-id member of the dup cluster survives")
    assert(!keep(100L) && dupOf(100L).contains(3L), s"100: ${out(100L)}")
    assert(!keep(101L) && dupOf(101L).contains(3L), s"101: ${out(101L)}")

    // cross-cell pair missed (both kept) — the measured recall trade-off
    assert(keep(200L) && keep(201L),
      "cell-scoped dedup must NOT form the cross-cell pair")

    // strangers and the remaining init vectors are untouched
    val dropped = out.filterNot(_._2._3).keySet
    assert(dropped == Set(100L, 101L), s"unexpected drops: $dropped")
  }

  test("l4: 5-way langid is non-degenerate — per-lang accuracy 1.0 on a real multilingual fixture") {
    // The shipped corpus text carries NO lexical language signal (31-token
    // vocabulary shared uniformly across the 5 labels — measured in SURVEY
    // §2.L), so corpus-level matches_label can only reflect the en share.
    // This fixture is where the operator's 5-way-ness is actually provable:
    // genuine function-word text per language, three docs each, and the
    // argmax must recover every label exactly.
    val s = spark
    import s.implicits._
    val fixture = Seq(
      (0L, "der hund und die katze ist nicht mit von den auf dem tisch", "de"),
      (1L, "das wetter ist heute nicht gut und wir bleiben auf der couch", "de"),
      (2L, "die kinder spielen mit dem ball und der vater ist von den bergen", "de"),
      (3L, "the cat is on a mat and it was of great comfort to the dog", "en"),
      (4L, "it is a truth that the weather was fine and we went to town", "en"),
      (5L, "the quick brown fox jumps over a lazy dog and it was fun", "en"),
      (6L, "el perro corre por las calles con una pelota para los vecinos", "es"),
      (7L, "esta casa es como el palacio que vimos por la manana con una torre", "es"),
      (8L, "los gatos duermen en las camas para que esta noche como siempre", "es"),
      (9L, "le chat est dans la maison pour vous avec ce panier et les jouets", "fr"),
      (10L, "la ville est belle dans ce quartier pour les gens qui vous aiment", "fr"),
      (11L, "les enfants jouent avec le ballon dans la cour ce matin qui brille", "fr"),
      (12L, "wo shi xue sheng ni hao ma zhe ge ren zai jia men kou", "zh"),
      (13L, "ni men hao wo zai zhe ge cheng shi bu xiang hui jia ma", "zh"),
      (14L, "zhe ge dong xi hao bu hao wo men shi zai kan ni de shu ma", "zh"))
    val dir = TestSpark.tmpDir("graft_l4_fixture")
    fixture.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("l4_text_langid")(spark, dir).collect()
    val byLang = out.groupBy(r => fixture.find(_._1 == r.getLong(0)).get._3)
    assert(byLang.keySet == Set("de", "en", "es", "fr", "zh"))
    byLang.foreach { case (lang, rows) =>
      val acc = rows.count(_.getBoolean(3)).toDouble / rows.length
      assert(acc == 1.0,
        s"$lang accuracy $acc — predictions: " +
          rows.map(r => s"${r.getLong(0)}→${r.getString(1)}").mkString(", "))
    }
    // every confidence must be positive: the argmax saw real marker hits
    assert(out.forall(_.getDouble(2) > 0.0), "a fixture doc scored zero markers")
  }

  test("l20: resampling by mix weights moves per-source token shares toward uniform") {
    // The semantic point of the operator, which the shared-formula hash
    // oracle cannot see: materializing the weights must actually REBALANCE
    // the corpus. Deterministic on the fixed corpus (the Bernoulli draws
    // are md5-of-id). Measured at authoring: max |share − 1/20| drops
    // 0.0082 → 0.0024 after resampling.
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val toks = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("nt"))
    def maxDev(masses: Map[String, Long]): Double = {
      val total = masses.values.sum.toDouble
      masses.values.map(m => math.abs(m / total - 1.0 / masses.size)).max
    }
    val orig = toks.groupBy("source").agg(sum("nt").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val res = SparkEntry.queries("l20_sample_by_weight")(spark, sf)
      .join(toks, "doc_id")
      .groupBy(toks("source")).agg(sum("nt").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res.keySet == orig.keySet, "a source vanished from the resample")
    assert(maxDev(res) < maxDev(orig),
      s"resampling did not rebalance: ${maxDev(orig)} -> ${maxDev(res)}")
  }

  test("l25: a planted drifted delta is detected and attributed; a same-distribution delta is not") {
    // The semantic point the hash oracle cannot see: the KL monitor must
    // FIRE on a genuinely drifted delta shard and stay quiet on a shard
    // drawn from the corpus distribution. Delta membership is the l18 md5
    // cut (first hex byte >= 'e0'), so the fixture pins ids on each side:
    // 3/5/34 are delta ids, 0/1/2/4/6/7 are corpus ids (verified md5).
    val s = spark
    import s.implicits._
    val corpusText = "alpha beta gamma delta alpha beta alpha gamma beta alpha"
    def run(deltaText: String): Map[String, (Long, Long)] = {
      val fixture = Seq(0L, 1L, 2L, 4L, 6L, 7L).map((_, corpusText, "en")) ++
        Seq(3L, 5L, 34L).map((_, deltaText, "en"))
      val dir = TestSpark.tmpDir("graft_l25_fixture")
      fixture.toDF("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("l25_token_drift")(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    }
    // drifted delta: dominated by a token the corpus never contains
    val drifted = run("zzdrift zzdrift zzdrift zzdrift alpha zzdrift zzdrift")
    assert(drifted.contains("zzdrift"), "drift token missing from the report")
    assert(drifted("zzdrift")._1 > 1000000,
      s"corpus-unseen drift token contributes ${drifted("zzdrift")._1} µnats — " +
        "should dominate (> 1 nat)")
    assert(drifted.values.head._2 > 1000000,
      s"drifted-delta KL ${drifted.values.head._2} µnats not flagged (> 1 nat expected)")
    assert(drifted("zzdrift")._1 == drifted.values.map(_._1).max,
      "the planted drift token must be the top KL contributor")
    // control: delta drawn from the corpus distribution — KL stays small
    val same = run(corpusText)
    assert(same.values.head._2 < 100000,
      s"same-distribution delta KL ${same.values.head._2} µnats — " +
        "monitor fires on no drift (< 0.1 nat expected)")
  }

  test("l23: no redactable pattern survives redaction; counts match what was planted") {
    // The invariant the hash oracle shares but a reader wants pinned
    // directly: after the scrub, the redacted text contains NO residual
    // match of any PII class, and every doc the md5 gates planted into a
    // class reports at least one match of that class.
    val out = SparkEntry.queries("l23_pii_redact")(spark, "/root/testdata/sf0.01")
      .collect()
    val res = Seq(
      """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""".r,
      """\b\d{3}-\d{3}-\d{4}\b""".r,
      """\b\d{3}-\d{2}-\d{4}\b""".r)
    out.foreach { r =>
      val red = r.getString(4)
      res.foreach(re => assert(re.findFirstIn(red).isEmpty,
        s"doc ${r.getLong(0)}: residual PII in redacted text: $red"))
    }
    out.foreach { r =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getLong(0).toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert((r.getLong(1) >= 1) == (h(0) < '8'),
        s"doc ${r.getLong(0)}: email count ${r.getLong(1)} vs gate ${h(0)}")
      assert((r.getLong(2) >= 1) == (h(1) < '8'),
        s"doc ${r.getLong(0)}: phone count ${r.getLong(2)} vs gate ${h(1)}")
      assert((r.getLong(3) >= 1) == (h(2) < '8'),
        s"doc ${r.getLong(0)}: id count ${r.getLong(3)} vs gate ${h(2)}")
    }
  }

  test("l24: funnel reconciles and every stage contributes at sf0.1") {
    // The report's accounting invariants, pinned on the tier with exact
    // text dups so the dedup stage genuinely drops rows (sf0.01 can't).
    val out = SparkEntry.queries("l24_filter_funnel")(spark, sfDup)
      .collect().sortBy(_.getLong(0))
    val total = spark.read.parquet(s"$sfDup/documents.parquet").count()
    assert(out.map(_.getString(1)).toSeq == Seq("all", "quality", "repetition",
      "unigram_lm", "exact_dedup", "decontaminate", "classifier"))
    assert(out.head.getLong(2) == total, "stage 'all' must count every doc")
    out.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getLong(2) <= prev.getLong(2),
        s"survivors grew at ${cur.getString(1)}")
      assert(cur.getLong(3) == prev.getLong(2) - cur.getLong(2),
        s"dropped does not reconcile at ${cur.getString(1)}")
    }
    assert(out.count(_.getLong(3) > 0) >= 4,
      s"funnel should be non-degenerate: ${out.map(r =>
        s"${r.getString(1)}=${r.getLong(2)}").mkString(", ")}")
    // sf0.1's exact-dup texts all die at earlier stages (verified: 7/8
    // pass quality but none survive repetition+LM), so the dedup stage's
    // own accounting is proven on a fixture where duplicates DO survive
    // to it: 3 identical clean docs + 3 distinct ones — dedup must drop
    // exactly the 2 non-min copies and nothing else.
    val s = spark
    import s.implicits._
    val base = "the quick brown fox and a lazy dog of the meadow ran over " +
      "the green hill and a river of light came down to the valley floor"
    val fixture = Seq(0L, 1L, 2L).map((_, base, "en")) ++ Seq(
      (3L, base.replace("valley", "canyon"), "en"),
      (4L, base.replace("river", "stream"), "en"),
      (5L, base.replace("meadow", "forest"), "en"))
    val dir = TestSpark.tmpDir("graft_l24_fixture")
    fixture.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f = SparkEntry.queries("l24_filter_funnel")(spark, dir)
      .collect().sortBy(_.getLong(0)).map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f("unigram_lm") == 6,
      s"fixture docs must all survive to dedup: $f")
    assert(f("exact_dedup") == 4 && f("decontaminate") == 4,
      s"dedup must drop exactly the 2 duplicate copies: $f")
  }

  test("l27: the classifier flips a doc every per-feature gate passes — it adds signal") {
    // The semantics the hash oracle can't see: l27 must not be a mere
    // conjunction of the l5/l14/l21 threshold gates. The fixture corpus
    // is built over a 29-token vocab with UNIFORM corpus-wide counts, so
    // every doc's unigram cross-entropy is exactly ln(29) = 3.3673 —
    // under l21's 3.41 gate — and the remaining features are controlled
    // per doc. Doc 0 is marginal on EVERY axis (xq 0.2753 ≥ 0.26,
    // top-bigram 4/52 = 0.0769 ≤ 0.08 via a 4×-repeated bigram,
    // dup-trigram 2/51 = 0.0392 ≤ 0.05): each gate passes individually,
    // but the classifier aggregates the evidence and rejects it
    // (z_u ≈ 1.346M < the 1.5M keep line). Doc 2 (clean single-pass
    // vocab walk) must keep — the classifier is not rejecting everything.
    val s = spark
    import s.implicits._
    val text0 = "a ant at ant ax at ax bee cow sun cat dog sky bee elm em elm " +
      "fog em fog hen ice sun cat dog sky ice id io id jam io jam map oak " +
      "owl cat dog fox map ox oak ox pig run the run un koi cat dog eel un"
    val text1 = "a ant at ax bee cow eel elm em fog fox hen ice id io jam koi " +
      "map oak owl ox pig run sky sun the un a ant at ax bee cow eel elm em " +
      "fog fox hen ice id io jam koi map oak owl ox pig run sky sun the un " +
      "a cow eel fox hen koi owl pig the" // complement: keeps corpus counts uniform
    val text2 = "a ant at ax bee cat cow dog eel elm em fog fox hen ice id " +
      "io jam koi map oak owl ox pig run sky sun the un"
    val fixture = Seq((0L, text0, "en"), (1L, text1, "en"), (2L, text2, "en"))
    val dir = TestSpark.tmpDir("graft_l27_fixture")
    fixture.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // the per-feature gates, asserted THROUGH the suite's own operators
    val qual = SparkEntry.queries("l5_text_quality")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(qual(0L) >= 0.26, s"fixture drift: doc 0 quality ${qual(0L)} < 0.26")
    val rep = SparkEntry.queries("l14_repetition_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(rep(0L), "fixture drift: doc 0 fails the l14 repetition gates")
    val lm = SparkEntry.queries("l21_unigram_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(lm(0L), "fixture drift: doc 0 fails the l21 xent gate")

    val clf = SparkEntry.queries("l27_quality_classifier")(spark, dir).collect()
    val keep = clf.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!keep(0L), "classifier must flip the all-gates-marginal doc 0")
    assert(keep(2L), "classifier must keep the clean doc 2")
    clf.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(1) >= 1500000L),
        s"keep disagrees with the z_u >= 1.5M line at doc ${r.getLong(0)}")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0,
        s"sigmoid score out of (0,1) at doc ${r.getLong(0)}")
    }
    // scores are monotone in z_u (same sigmoid on the quantized logit)
    clf.sortBy(_.getLong(1)).sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(2) <= hi.getDouble(2),
        s"score not monotone in z_u: ${lo.getLong(0)} vs ${hi.getLong(0)}")
    }
  }

  test("l29: CDC chunking detects a shared passage at DIFFERENT offsets — the grid-segmentation failure mode") {
    // The semantics the hash oracle can't see: content-defined boundaries
    // depend only on local content, so a passage shared by two docs at
    // different offsets must chunk identically in both. The passage
    // 'charlie alpha foxtrot delta bravo hotel echo' cuts after 'alpha'
    // and after 'bravo' (verified md5-bigram breaks) → its interior chunk
    // [foxtrot delta bravo] is context-independent. doc 0 embeds it at
    // offset 2, doc 1 at offset 5: doc 1's copy must be flagged as a
    // duplicate (doc 0 holds the canonical (min doc, min chunk)
    // occurrence); the passage-free doc 2 must have zero dups. Fixture
    // doc_ids 0-2 all sit OUTSIDE the md5 boilerplate-plant gate, so the
    // only sharing is the embedded passage.
    val s = spark
    import s.implicits._
    val passage = "charlie alpha foxtrot delta bravo hotel echo"
    val fixture = Seq(
      (0L, s"golf india $passage kilo", "en"),
      (1L, s"lima mike november oscar papa $passage quebec", "en"),
      (2L, "romeo sierra tango uniform victor", "en"))
    val dir = TestSpark.tmpDir("graft_l29_fixture")
    fixture.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("l29_dedup_cdc_chunks")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 >= 1,
      s"doc 1's offset-shifted copy of the shared passage was not flagged: $out")
    assert(out(2L)._2 == 0, s"passage-free doc 2 must have zero dup chunks: $out")
    assert(out(0L)._2 < out(0L)._1, "doc 0 cannot be all-duplicate")
    // and on the real corpus the planted footer must dominate: the
    // interior boilerplate chunks repeat across ~250 docs at sf0.01
    val corpus = SparkEntry.queries("l29_dedup_cdc_chunks")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(corpus.count(_.getLong(2) > 0) > 250,
      "the planted boilerplate should give most gated docs dup chunks")
    assert(corpus.count(r => !r.getBoolean(4)) > 100,
      "the keep line should be non-vacuous at sf0.01")
  }

  test("l32: a planted 3-doc CHAIN lands in one cluster through the FULL pipeline") {
    // The semantics the sf0.01 hash can't see: that corpus's dup graph is
    // 22 pairs + one TRIANGLE (similarity is bimodal — true pairs ≥ 0.9
    // Jaccard, everything else < 0.3 at any threshold), so its min-labels
    // coincide with one-hop neighbourhood minima. This fixture plants the
    // chain case a one-hop formulation gets WRONG: A = 22 distinct tokens
    // (20 shingles), B = A + 4 tail tokens (24 shingles, J(A,B) = 20/24 ≈
    // 0.83 ≥ 0.8), C = B + 4 more (28 shingles, J(B,C) = 24/28 ≈ 0.86,
    // J(A,C) = 20/28 ≈ 0.71 < 0.8 — the ENDPOINTS SHARE NO EDGE). After
    // one propagation round C still carries B's id; only the iterated
    // closure relabels it to A's. Exercises shingling, prefix filtering,
    // verification, AND the closure — not minLabelClosure in isolation
    // (PropertySpec covers that on random graphs).
    val s = spark
    import s.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor"
    val mid = base + " apple berry cedar dates"
    val far = mid + " elm fig grape holly"
    val fixture = Seq(
      (10L, base, "en"), (11L, mid, "en"), (12L, far, "en"),
      (13L, "zebra yak wolf vole toad", "en")) // singleton control
    val dir = TestSpark.tmpDir("graft_l32_fixture")
    fixture.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("l32_dedup_cluster_cc")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    Seq(10L, 11L, 12L).foreach { id =>
      assert(out(id)._1 == 10L,
        s"doc $id not labelled with the chain minimum: $out")
      assert(out(id)._2 == 3L, s"doc $id csize: $out")
    }
    assert(out(10L)._3 && !out(11L)._3 && !out(12L)._3,
      s"canonical flag must mark exactly the min member: $out")
    assert(out(13L) == ((13L, 1L, true)), s"singleton mishandled: $out")
  }

  test("l3: IVF ANN recall vs the exact top-10 (j4) is useful, not just self-consistent") {
    val ivf = SparkEntry.queries("l3_ann_ivf_topk")(spark, sfTiny)
      .collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("j4_sim_knn_query")(spark, sfTiny)
      .collect().map(_.getLong(0)).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall (probing 4/16 cells)")
  }

  test("l40: shard shuffle is a lossless, balanced, seed-stable permutation") {
    val rows = SparkEntry.queries("l40_shuffle_shards")(spark, sfTiny)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val n = graft.Tables.t(spark, sfTiny, "documents").count()
    // lossless: every doc exactly once
    assert(rows.length == n && rows.map(_._3).distinct.length == n)
    // positions are contiguous 1..count within each shard (the loader
    // contract: no gaps a restart could mis-seek over)
    rows.groupBy(_._1).foreach { case (shard, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length),
        s"shard $shard positions not contiguous")
    }
    // hash-uniform balance: no shard beyond 2x the ideal share
    val sizes = rows.groupBy(_._1).values.map(_.length)
    assert(sizes.max <= 2.0 * n / 8,
      s"hot shard: sizes ${sizes.toSeq.sorted}")
    // seed-stable: the permutation is pure arithmetic — a re-run is
    // byte-identical (determinism IS the operator's contract)
    val again = SparkEntry.queries("l40_shuffle_shards")(spark, sfTiny)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
    // the order is actually SHUFFLED, not the input order: doc_ids within
    // a shard must not be monotone (probability ~0 under the hash order)
    assert(rows.groupBy(_._1).values.exists { g =>
      val ids = g.sortBy(_._2).map(_._3).toSeq
      ids != ids.sorted
    }, "shuffle left doc_ids in input order")
  }

  test("l43: textbook BPE fixture learns the hand-derived merge sequence") {
    // Sennrich's low/lower/newest/widest example, merges derived by hand
    // INCLUDING the tie-breaks: round 1 has three pairs at freq 9
    // ((e,s), (s,t), (t,#)) and the (freq DESC, pair lex) rule must pick
    // (e,s); round 4 ties (l,o) with (o,w) at 7 and must pick (l,o).
    import spark.implicits._
    val toks = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("term")
    val m = graft.operators.TrainOps.bpeMerges(spark, toks, 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "#", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)), s"got ${m.toSeq}")
  }

  test("l48: textbook merges encode the fixture words to their hand-derived symbol sequences") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "#"), ("l", "o"), ("lo", "w"))
    val toks = Seq("low", "lower", "newest", "widest", "lowest").toDF("term")
    val got = graft.operators.TrainOps.bpeEncodeVocab(toks, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // hand-derivation under the 5 rules, rank order, greedy-leftmost:
    //  low    → l o w #       → (l,o) → lo w # → (lo,w) → low #
    //  lower  → l o w e r #   → lo w e r # → low e r #
    //  newest → n e w e s t # → (e,s) n e w es t # → (es,t) n e w est #
    //           → (est,#) n e w est#
    //  widest → w i d est#    (same suffix path)
    //  lowest → l o w e s t # → es → l o w es t # → est → l o w est # →
    //           est# → l o w est# → lo → lo w est# → low → low est#
    assert(got == Map(
      "low" -> List("low", "#"),
      "lower" -> List("low", "e", "r", "#"),
      "newest" -> List("n", "e", "w", "est#"),
      "widest" -> List("w", "i", "d", "est#"),
      "lowest" -> List("low", "est#")), s"got $got")
  }

  test("l48: vocab encoder == sequential reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(48)
    def refApply(w: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == l && w(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += w(i); i += 1 }
      }
      out.toList
    }
    (1 to 3).foreach { iter =>
      val words = (0 until 40).map { _ =>
        val n = 1 + rnd.nextInt(7)
        List.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString // dense repeats
      }.distinct
      val toks = words.toDF("term")
      // learn real merges from this corpus, then encode with them
      val merges = graft.operators.TrainOps.bpeMerges(spark, toks, 4)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val got = graft.operators.TrainOps.bpeEncodeVocab(toks, merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      val want = words.map { t =>
        val start = t.split("").toList :+ "#"
        t -> merges.foldLeft(start) { case (syms, (l, r)) => refApply(syms, l, r) }
      }.toMap
      assert(got == want, s"iter=$iter merges=$merges")
    }
  }
}
