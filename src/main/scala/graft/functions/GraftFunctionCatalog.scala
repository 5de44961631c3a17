package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A V2 `FunctionCatalog` (k10) — the MODERN engine-native route for
  * catalog-scoped functions, completing the extension story next to
  * k1's classic UDF, k2/k6's Aggregators, k3's generator, k5's SQL
  * macro and k9's SQL TVF: functions resolve through
  * `catalog.namespace.name(...)` in plain SQL, BIND against the actual
  * argument types at analysis time (wrong types REFUSED at analysis,
  * not at runtime — gated in-key), and execute through typed paths:
  *
  *  - the scalar `math.gcd` carries the MAGIC METHOD
  *    (`invoke(long, long)`): the engine dispatches to it with
  *    primitive arguments via an `Invoke` expression inside
  *    whole-stage codegen — no InternalRow boxing per row, the whole
  *    point of the V2 function API over k1's UDF (ExtensionsSpec pins
  *    the Invoke dispatch from the executed plan). `produceResult` is
  *    the documented interpreted fallback.
  *  - the aggregate `math.gcd_agg` implements the V2
  *    [[AggregateFunction]] contract (state / update / MERGE /
  *    produceResult): gcd is associative+commutative and
  *    integer-exact, so partial aggregation is SEMANTICALLY FREE —
  *    every partition folds locally and merge combines partials, the
  *    map-side-combine shape the engine plans for any distributive
  *    agg. (That is why gcd and not a float fold: FP partial sums
  *    would hash-drift with partition order.)
  *
  * At 100 TB a function catalog is how an org ships ONE vetted
  * implementation of domain logic to every query without UDF-registry
  * drift; bind-time typing plus codegen dispatch makes it cost the
  * same as a built-in. */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {
  private var catalogName: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val fns: Map[(Seq[String], String), UnboundFunction] = Map(
    (Seq("math"), "gcd") -> GcdUnbound,
    (Seq("math"), "gcd_agg") -> GcdAggUnbound)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    fns.keys.filter(_._1 == namespace.toSeq)
      .map { case (ns, n) => Identifier.of(ns.toArray, n) }.toArray
  override def loadFunction(ident: Identifier): UnboundFunction =
    fns.getOrElse((ident.namespace.toSeq, ident.name),
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
        ident))
}

object GcdUnbound extends UnboundFunction {
  override def name(): String = "gcd"
  override def description(): String =
    "gcd(BIGINT, BIGINT): greatest common divisor (of absolute values)"
  override def bind(inputType: StructType): BoundFunction = {
    // bind-time typing: the V2 contract's analysis-not-runtime refusal
    if (inputType.fields.length != 2 ||
        inputType.fields.exists(_.dataType != LongType))
      throw new UnsupportedOperationException(
        s"gcd expects (BIGINT, BIGINT), got ${inputType.simpleString}")
    GcdFunction
  }
}

object GcdFunction extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "gcd"
  override def canonicalName(): String = "graft.math.gcd"
  override def isResultNullable: Boolean = false

  @annotation.tailrec
  private[functions] def gcd(a: Long, b: Long): Long =
    if (b == 0L) math.abs(a) else gcd(b, a % b)

  /** the MAGIC METHOD: primitive-typed, dispatched via Invoke inside
    * whole-stage codegen — zero per-row boxing. */
  def invoke(a: Long, b: Long): Long = gcd(a, b)

  // interpreted fallback (the engine uses it when magic lookup fails)
  override def produceResult(input: InternalRow): java.lang.Long =
    gcd(input.getLong(0), input.getLong(1))
}

object GcdAggUnbound extends UnboundFunction {
  override def name(): String = "gcd_agg"
  override def description(): String =
    "gcd_agg(BIGINT): greatest common divisor of all input values"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 1 ||
        inputType.fields.head.dataType != LongType)
      throw new UnsupportedOperationException(
        s"gcd_agg expects (BIGINT), got ${inputType.simpleString}")
    GcdAggFunction
  }
}

object GcdAggFunction extends AggregateFunction[java.lang.Long, java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "gcd_agg"
  override def canonicalName(): String = "graft.math.gcd_agg"
  override def isResultNullable: Boolean = false

  // gcd(0, x) = x — the identity, so empty partitions merge as no-ops
  override def newAggregationState(): java.lang.Long = 0L
  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state
    else GcdFunction.gcd(state, input.getLong(0))
  override def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
    GcdFunction.gcd(a, b)
  override def produceResult(state: java.lang.Long): java.lang.Long = state
}
