package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler string similarity (SURVEY.md §7.4 — the scalar
  * rung of the extension ladder; the record-linkage kernel l37 scores
  * candidate pairs with).
  *
  * Spark has `levenshtein` but no Jaro-Winkler; a Scala UDF would box both
  * strings and break whole-stage codegen at the hottest point of a
  * pair-scoring join. This native expression stays inside codegen: the
  * generated code makes ONE static call into [[JaroWinkler.similarity]]
  * per row — primitive doubles in and out, no boxing, no encoder.
  *
  * The kernel is pinned to the CLASSIC Jaro-Winkler definition, verified
  * against DuckDB 1.0's `jaro_winkler_similarity` case-by-case (the l37
  * oracle): match window `max(|a|,|b|)/2 - 1`; transpositions =
  * (mismatched matched-positions)/2 with INTEGER division (probed:
  * 'abcdef'/'bcadef' → 0.944..., i.e. t=1 from 3 mismatches); Winkler
  * boost `jw = j + l·0.1·(1-j)` applied only when jaro > 0.7, common
  * prefix `l` capped at 4 (probed: 'aaaaaab'/'aaaaaac' → 0.9428...);
  * either side empty → 0.0 (probed: even ''~'' is 0.0, not 1.0).
  * Comparison is BYTEWISE over UTF-8 — exactly what DuckDB does; on
  * ASCII data the two notions coincide.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Classic Jaro-Winkler over UTF-8 bytes; see [[JaroWinklerSim]] for the
    * pinned semantics. Called from generated code — keep the signature
    * primitive-friendly and static. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both matched subsequences in position order
    var mismatch = 0
    var j = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1(i) != s2(j)) mismatch += 1
        j += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val m = matches.toDouble
    val jaro = (m / n1 + m / n2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n1, n2))
    while (l < maxL && s1(l) == s2(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** SQL-registration builder with a proper arity error. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"jaro_winkler expects exactly 2 string arguments, got ${exprs.length}")
    JaroWinklerSim(exprs.head, exprs(1))
  }

  /** `jaro_winkler(a, b)` as a Column. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaroWinklerSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
