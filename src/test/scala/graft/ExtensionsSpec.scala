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
}
