package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating Catalyst expression (SURVEY.md §7.4, the generator rung
  * of the extension ladder): `first_n_words(text, n)` explodes a document
  * into its first `n` lowercase words as (word, position) rows, positions
  * 1-based.
  *
  * This is the whole-operator-semantics alternative to k3's typed
  * `flatMap`: a native `Generator` plugs into the analyzer's
  * ExtractGenerator rule and executes inside `GenerateExec` — no encoder
  * round-trip (the flatMap deserializes every row to a case class and
  * re-encodes every output), and upstream column pruning still works
  * because the generator declares exactly one required child column.
  * Tokenization is pinned to the corpus-wide rule (lowercase, split on
  * non-letters, drop empties) so results are bit-identical to the flatMap
  * formulation and to the DuckDB oracle's `string_split_regex`.
  *
  * Per-row work is O(prefix scanned): the split stops being consumed after
  * `n` words (iterator semantics), so pathological multi-MB documents do
  * not pay full-text tokenization here.
  */
case class FirstNWords(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  require(n.foldable, "first_n_words: n must be a foldable integer literal")

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType = new StructType()
    .add("word", StringType, nullable = false)
    .add("position", LongType, nullable = false)

  private lazy val limit: Int = n.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"first_n_words: n must be integral, got $other")
  }

  override def prettyName: String = "first_n_words"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      // iterator pipeline: tokenization halts once `limit` words are taken
      raw.asInstanceOf[UTF8String].toString.toLowerCase
        .split("[^a-z]+").iterator
        .filter(_.nonEmpty).take(limit).zipWithIndex
        .map { case (w, i) =>
          InternalRow(UTF8String.fromString(w), (i + 1).toLong)
        }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FirstNWords =
    copy(child = newChildren(0), n = newChildren(1))
}

object FirstNWords {
  /** SQL-registration builder (GraftExtensions / FunctionRegistry). */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"first_n_words expects exactly 2 arguments (text, n), got ${exprs.length}")
    FirstNWords(exprs.head, exprs(1))
  }

  /** `first_n_words(text, n)` as a Column — use in a select like
    * `explode`; alias the two outputs with `.as(Seq("word", "position"))`. */
  def firstNWords(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      FirstNWords(GraftColumnBridge.expression(text), Literal(n)))
}
