package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tolerance checks for the two justified-unoracled approximate operators
  * (SURVEY §2.D d4, §2.J j2 — j2 has its own spec). */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("d4: HLL distinct counts within 5% of exact d3 per group") {
    val exact = SparkEntry.queries("d3_agg_count_distinct")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("d4_agg_approx_hll")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"group $k: approx=$ap exact=$ex off by more than 5%")
    }
  }

  test("d16: approx quantiles within 1% of exact d11 per group") {
    def rows(key: String) = SparkEntry.queries(key)(spark, sfTiny)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = rows("d11_agg_percentile")
    val approx = rows("d16_agg_approx_quantile")
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (m, p)) =>
      val (am, ap) = approx(k)
      assert(math.abs(am - m) / m <= 0.01, s"$k median approx=$am exact=$m")
      assert(math.abs(ap - p) / p <= 0.01, s"$k p90 approx=$ap exact=$p")
    }
  }
}
