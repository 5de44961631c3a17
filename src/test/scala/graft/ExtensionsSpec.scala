package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k2's Aggregator must be partial-merge correct: the result cannot depend
  * on how rows are split across shuffle partitions (exact decimal sums
  * make the merge associative and order-independent). */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("k2: weighted mean is invariant to input partitioning") {
    val wm = udaf(graft.operators.Extensions.WeightedMean)
    val li = graft.Tables.t(spark, sfTiny, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity")
    def run(parts: Int) = li.repartition(parts)
      .groupBy("l_returnflag")
      .agg(wm(col("l_extendedprice"), col("l_quantity")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(1) == run(7))
  }

  test("k1/k3/k4 smoke on sf0.001") {
    Seq("k1_udf_scalar", "k3_udtf_generator", "k4_typed_dataset").foreach { k =>
      assert(SparkEntry.queries(k)(spark, sfTiny).count() > 0, k)
    }
  }

  test("k3: native Generator matches the typed flatMap it replaced, row for row") {
    import spark.implicits._
    // the r6 formulation k3 shipped with before the FirstNWords rewrite —
    // kept HERE as the differential baseline: same tokenizer, same limit,
    // same 1-based positions, via the encoder round-trip the Generator
    // avoids
    val flat = graft.Tables.t(spark, sfTiny, "documents")
      .select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        text.toLowerCase.split("[^a-z]+").iterator
          .filter(_.nonEmpty).take(5).zipWithIndex
          .map { case (w, i) => (id, w, (i + 1).toLong) }
      }
      .toDF("doc_id", "word", "position")
      .orderBy("doc_id", "position")
      .collect().map(_.toSeq).toSeq
    val gen = SparkEntry.queries("k3_udtf_generator")(spark, sfTiny)
      .collect().map(_.toSeq).toSeq
    assert(gen == flat,
      s"Generator diverges from flatMap baseline: ${gen.size} vs ${flat.size} rows")
  }

  test("k3: plans through GenerateExec and prunes the scan to doc_id/text") {
    // string pin (the PlanShapeSpec idiom): the AQE wrapper hides the
    // subtree from SparkPlan.collect, but the rendered plan shows it.
    // "Generate first_n_words(" is GenerateExec running our expression.
    val exec = SparkEntry.queries("k3_udtf_generator")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(exec.contains("Generate first_n_words("),
      s"no GenerateExec running first_n_words:\n$exec")
    // the generator declares one required child column, so upstream
    // pruning must reach the parquet scan: doc_id + text, nothing else
    assert(exec.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to doc_id/text:\n$exec")
  }
}
