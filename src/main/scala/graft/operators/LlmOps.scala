package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.J — LLM-training-data pipeline operators over the
  * `documents` / `embeddings` corpus tables.
  *
  * Scale design notes (the 100 TB story, per operator):
  *  - exact dedup (j1) hash-partitions on the content digest — the groupBy
  *    shuffles digests, never the full text twice;
  *  - near-dedup (j2) is MinHash+LSH: candidate pairs come from equi-joins
  *    on band buckets (shuffle on bucket id), never a quadratic scan;
  *  - similarity (j3/j4) keeps the exact quadratic kernel only as the
  *    correctness baseline; the scale path is the LSH/banding variant and
  *    broadcast of the query side for kNN;
  *  - tokenize/tf-idf/ngrams (j5-j7) are explode→groupBy pipelines: one
  *    shuffle per aggregation grain, all map-side combinable;
  *  - incremental/SCD compaction (j11/j12) partitions by the upsert key so
  *    the window dedup is a single shuffle, the classic merge-on-read
  *    compaction kernel.
  */
object LlmOps {

  /** lower + split on non-letter runs; drops empty tokens. */
  private def tokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(col("term") =!= "")

  /** embeddings with the float vector promoted to double + L2 norm. */
  private def embs(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("emb"))
      .withColumn("norm",
        sqrt(aggregate(col("emb"), lit(0.0), (acc, x) => acc + x * x)))

  private def cosine(a: String, b: String) =
    aggregate(zip_with(col(s"$a.emb"), col(s"$b.emb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) / (col(s"$a.norm") * col(s"$b.norm"))

  val queries: Map[String, Q] = Map(
    // exact dedup: keep min doc_id per sha256(text)
    "j1_dedup_exact" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(sha2(col("text"), 256).as("digest"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id", "digest")
        .orderBy("doc_id")),

    // near-dup candidates via MinHash LSH (seeded; no SQL oracle — validated
    // against exact Jaccard in LlmOpsSpec)
    "j2_dedup_near_minhash" -> ((s, d) => {
      import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, RegexTokenizer}
      val docs = t(s, d, "documents").select("doc_id", "text")
      val tok = new RegexTokenizer().setInputCol("text").setOutputCol("toks")
        .setPattern("[^a-z]+").setToLowercase(true)
      val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
        .setNumFeatures(1 << 18).setBinary(true)
      val featured = tf.transform(tok.transform(docs))
      val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(8).setSeed(42L)
      val model = lsh.fit(featured)
      model.approxSimilarityJoin(featured, featured, 0.5, "jaccard_dist")
        .select(col("datasetA.doc_id").as("a_id"),
          col("datasetB.doc_id").as("b_id"),
          rnd4(col("jaccard_dist")).as("dist"))
        .filter(col("a_id") < col("b_id"))
        .orderBy("a_id", "b_id")
    }),

    // exact top-20 cosine pairs (correctness baseline for ANN)
    "j3_sim_cosine_pairs" -> ((s, d) => {
      val e = embs(s, d)
      e.as("a").join(broadcast(e.as("b")),
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          rnd4(cosine("a", "b")).as("sim"))
        .orderBy(col("sim").desc, col("a_id"), col("b_id"))
        .limit(20)
    }),

    // top-10 nearest neighbours of vec_id=0 (broadcast query side)
    "j4_sim_knn_query" -> ((s, d) => {
      val e = embs(s, d)
      val q = e.filter(col("vec_id") === 0)
        .select(col("emb").as("q_emb"), col("norm").as("q_norm"))
      e.filter(col("vec_id") > 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          rnd4(aggregate(zip_with(col("emb"), col("q_emb"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x) / (col("norm") * col("q_norm")))
            .as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // top-50 words
    "j5_text_wordcount" -> ((s, d) =>
      tokens(s, d)
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(50)),

    // per-doc top term by tf-idf; idf = ln((N+1)/(df+1)) + 1 (pinned §2.J)
    "j6_text_tfidf" -> ((s, d) => {
      val tf = tokens(s, d).groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("score", round(col("tf") *
          (log((col("n_docs") + 1).cast(DoubleType) / (col("df") + 1)) + 1), 4))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("doc_id", "term", "score")
        .orderBy("doc_id")
    }),

    // top-20 word bigrams
    "j7_text_ngrams" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), posexplode(split(lower(col("text")), "[^a-z]+")))
        .withColumnRenamed("col", "term")
        .filter(col("term") =!= "")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      toks.withColumn("next", lead(col("term"), 1).over(w))
        .filter(col("next").isNotNull)
        .select(concat_ws(" ", col("term"), col("next")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)
    }),

    // corpus profile per (lang, source)
    "j8_text_lang_stats" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("docs"),
          rnd4(avg(col("n_chars"))).as("avg_chars"),
          countDistinct(col("text")).as("distinct_docs"))
        .orderBy("lang", "source")),

    // lexicon sentiment: fixed word -> {-1,+1} map, sum per doc, histogram per lang
    "j9_sentiment_lexicon" -> ((s, d) => {
      val lex = s.createDataFrame(Seq(
        ("fast", 1), ("small", 1), ("slow", -1), ("batch", -1)))
        .toDF("term", "sc")
      val perDoc = tokens(s, d).join(broadcast(lex), "term")
        .groupBy("doc_id").agg(sum(col("sc")).as("sc"))
      t(s, d, "documents").select("doc_id", "lang")
        .join(perDoc, Seq("doc_id"), "left")
        .withColumn("score", coalesce(col("sc"), lit(0L)))
        .groupBy("lang", "score").agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "score")
    }),

    // multimodal join: text table x vector table
    "j10_multimodal_join" -> ((s, d) =>
      t(s, d, "documents")
        .join(t(s, d, "embeddings"), col("doc_id") === col("vec_id"))
        .groupBy("lang", "label")
        .agg(count(lit(1)).as("docs"), rnd4(avg(col("n_chars"))).as("avg_chars"))
        .orderBy("lang", "label")),

    // incremental window: rows after a pinned checkpoint, idempotent-upsert
    // (dedup on event_id, last-write-wins by ts)
    "j11_etl_incremental_window" -> ((s, d) => {
      val w = Window.partitionBy("event_id")
        .orderBy(col("ts").desc, col("value").desc)
      t(s, d, "events")
        .filter(col("ts") > lit("2024-01-15 00:00:00").cast(TimestampType))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          epochUs(col("ts")).as("ts_us"), col("value"))
        .orderBy("event_id")
    }),

    // SCD-style compaction: latest event per (user_id, event_type)
    "j12_scd_last_wins" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          epochUs(col("ts")).as("ts_us"), col("value"))
        .orderBy("user_id", "event_type")
    }),

    // per-column data-quality profile of orders: one aggregate pass + stack
    // (single scan at scale, vs one scan per column)
    "j13_data_quality_profile" -> ((s, d) => {
      val o = t(s, d, "orders")
      def prof(c: String, minS: org.apache.spark.sql.Column,
               maxS: org.apache.spark.sql.Column) = Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        minS.as(s"${c}_min"), maxS.as(s"${c}_max"))
      val aggs =
        prof("o_orderkey", min(col("o_orderkey")).cast(StringType),
          max(col("o_orderkey")).cast(StringType)) ++
        prof("o_custkey", min(col("o_custkey")).cast(StringType),
          max(col("o_custkey")).cast(StringType)) ++
        prof("o_orderstatus", min(col("o_orderstatus")), max(col("o_orderstatus"))) ++
        prof("o_totalprice", min(col("o_totalprice")).cast(StringType),
          max(col("o_totalprice")).cast(StringType)) ++
        prof("o_orderdate", unix_millis(min(col("o_orderdate")).cast(TimestampType))
            .cast(StringType),
          unix_millis(max(col("o_orderdate")).cast(TimestampType)).cast(StringType)) ++
        prof("o_orderpriority", min(col("o_orderpriority")), max(col("o_orderpriority")))
      val one = o.agg(aggs.head, aggs.tail: _*)
      val stackExpr = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
        .map(c => s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max")
        .mkString("stack(6, ", ", ", ") as (col_name, null_cnt, distinct_cnt, min_s, max_s)")
      one.selectExpr(stackExpr).orderBy("col_name")
    })
  )

  private val toksSql =
    """SELECT doc_id, lang, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
       FROM documents"""

  val oracle: Map[String, String] = Map(
    "j1_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, sha256(text) AS digest
         FROM documents GROUP BY sha256(text) ORDER BY doc_id""",

    "j3_sim_cosine_pairs" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
             / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
              * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(b.embedding, x -> CAST(x AS DOUBLE))))), 4) AS sim
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         ORDER BY sim DESC, a_id, b_id LIMIT 20""",

    "j4_sim_knn_query" ->
      """WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
                    FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
           round(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qe)
             / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(embedding, x -> CAST(x AS DOUBLE))))
              * sqrt(list_dot_product(qe, qe))), 4) AS sim
         FROM embeddings, q WHERE vec_id > 0
         ORDER BY sim DESC, vec_id LIMIT 10""",

    "j5_text_wordcount" ->
      s"""SELECT term, count(*) AS cnt FROM ($toksSql) WHERE term <> ''
          GROUP BY term ORDER BY cnt DESC, term LIMIT 50""",

    "j6_text_tfidf" ->
      s"""WITH toks AS (SELECT * FROM ($toksSql) WHERE term <> ''),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term,
                     round(tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1), 4) AS score
              FROM tf JOIN df USING (term) CROSS JOIN n)
          SELECT doc_id, term, score FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rn FROM scored)
          WHERE rn = 1 ORDER BY doc_id""",

    "j7_text_ngrams" ->
      """WITH toks AS (
           SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS term
           FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS w
                 FROM documents)),
         seq AS (SELECT doc_id, pos, term,
                   lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS next
                 FROM toks WHERE term <> '')
         SELECT term || ' ' || next AS bigram, count(*) AS cnt
         FROM seq WHERE next IS NOT NULL
         GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""",

    "j8_text_lang_stats" ->
      """SELECT lang, source, count(*) AS docs,
           round(avg(n_chars), 4) AS avg_chars,
           count(DISTINCT text) AS distinct_docs
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    "j9_sentiment_lexicon" ->
      s"""WITH toks AS (SELECT * FROM ($toksSql) WHERE term <> ''),
            lex(term, sc) AS (VALUES ('fast', 1), ('small', 1), ('slow', -1), ('batch', -1)),
            per_doc AS (
              SELECT t.doc_id, CAST(sum(sc) AS BIGINT) AS sc
              FROM toks t JOIN lex USING (term) GROUP BY 1)
          SELECT d.lang, coalesce(p.sc, 0) AS score, count(*) AS n_docs
          FROM documents d LEFT JOIN per_doc p USING (doc_id)
          GROUP BY 1, 2 ORDER BY 1, 2""",

    "j10_multimodal_join" ->
      """SELECT lang, label, count(*) AS docs, round(avg(n_chars), 4) AS avg_chars
         FROM documents JOIN embeddings ON doc_id = vec_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "j11_etl_incremental_window" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
         FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                 ORDER BY ts DESC, value DESC) AS rn
               FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00')
         WHERE rn = 1 ORDER BY event_id""",

    "j12_scd_last_wins" ->
      """SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",

    "j13_data_quality_profile" ->
      """SELECT col_name, null_cnt, distinct_cnt, min_s, max_s FROM (
           SELECT 'o_orderkey' AS col_name,
                  count(*) - count(o_orderkey) AS null_cnt,
                  count(DISTINCT o_orderkey) AS distinct_cnt,
                  CAST(min(o_orderkey) AS VARCHAR) AS min_s,
                  CAST(max(o_orderkey) AS VARCHAR) AS max_s FROM orders
           UNION ALL
           SELECT 'o_custkey', count(*) - count(o_custkey),
                  count(DISTINCT o_custkey),
                  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
                  count(DISTINCT o_orderstatus),
                  min(o_orderstatus), max(o_orderstatus) FROM orders
           UNION ALL
           SELECT 'o_totalprice', count(*) - count(o_totalprice),
                  count(DISTINCT o_totalprice),
                  CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderdate', count(*) - count(o_orderdate),
                  count(DISTINCT o_orderdate),
                  CAST(epoch_ms(min(o_orderdate)) AS VARCHAR),
                  CAST(epoch_ms(max(o_orderdate)) AS VARCHAR) FROM orders
           UNION ALL
           SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
                  count(DISTINCT o_orderpriority),
                  min(o_orderpriority), max(o_orderpriority) FROM orders)
         ORDER BY col_name"""
  )
}
