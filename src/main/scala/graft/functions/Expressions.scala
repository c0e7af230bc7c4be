package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the reference's comparator surface
  * (SURVEY.md §2.7, §2.11). Native expressions with codegen — they stay
  * inside whole-stage codegen instead of breaking the pipeline the way
  * a Scala UDF would.
  */

/** Collation key under a named comparator — the engine's analog of
  * `cmp_sort_compare` (graphd/graphd.h:859-996). `orderBy(sort_key(v))`
  * gives the reference's sort order; the key is also usable as a
  * range-scan key (vrange, graphd/graphd-iterator-vrange.c).
  */
case class GraphdSortKey(child: Expression, comparator: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      GraphdText.sortKey(comparator, v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmp = ctx.addReferenceObj("cmp", comparator, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.GraphdText.sortKey($cmp, $c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): GraphdSortKey =
    copy(child = newChild)
}

/** `value ~= pattern` word/glob match under a named comparator —
  * default: graphd-comparator-default.c:87-560; octet: the
  * case-sensitive variant (graphd-comparator-octet.c:56-180).
  */
case class GraphdMatch(left: Expression, right: Expression,
    comparator: String = "default") extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any, p: Any): Any =
    GraphdText.matchesCmp(comparator, v.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmp = ctx.addReferenceObj("cmp", comparator, "java.lang.String")
    defineCodeGen(ctx, ev, (v, p) =>
      s"graft.functions.GraphdText.matchesCmp($cmp, $v.toString(), $p.toString())")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraphdMatch =
    copy(left = l, right = r)
}

/** Word segmentation as an expression — tokenizes a value into the
  * lowercase word array that backs the inverted WORD index
  * (libpdb/pdb-word.c:20-60, hash type PDB_HASH_WORD libpdb/pdb.h:228).
  */
case class GraphdWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any = {
    val ws = GraphdText.words(v.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ws.map(UTF8String.fromString).toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraphdWords.evalArray($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): GraphdWords =
    copy(child = newChild)
}

object GraphdWords {
  /** codegen helper */
  def evalArray(s: String): org.apache.spark.sql.catalyst.util.GenericArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GraphdText.words(s).map(UTF8String.fromString).toArray[Any])
}

/** pdb_hmap_value_normalize as an expression — the key a value hashes
  * under in the value HMAP (libpdb/pdb-word.c:1098). Drives the
  * number-comparator's inclusive lower bound, which admits the whole
  * hash bucket of the boundary value (numberequal r6: value>="0"
  * includes " 0").
  */
case class GraphdValueNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      GraphdText.valueNormalize(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.GraphdText.valueNormalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): GraphdValueNorm =
    copy(child = newChild)
}

/** Dot product of two numeric array columns in double math — the
  * vector-similarity hot path. Semantically identical to
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` over double-cast
  * elements (same left-to-right IEEE fold, so scores are bit-identical
  * to the declarative form), but it compiles to one tight loop inside
  * whole-stage codegen instead of 2·dims interpreted lambda calls per
  * pair. At 100 TB the candidate-pair volume dwarfs the corpus, so the
  * per-pair constant is the whole game.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (af, bf) = (isFloat(left).toString, isFloat(right).toString)
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecMath.dot($a, $b, $af, $bf)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** L2 norm of a numeric array column in double math (same ordered
  * fold as `sqrt(aggregate(a, 0.0, (acc, x) => acc + x*x))`).
  */
case class VecNorm(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any =
    VecMath.normL2(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat.toString
    defineCodeGen(ctx, ev, a => s"graft.functions.VecMath.normL2($a, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** codegen helpers — dense numeric arrays (no null elements), as
  * embedding columns are by construction
  */
object VecMath {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  def normL2(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }
}

object GraphdFunctions {
  /** sort/range key under a comparator (default/number/datetime/octet/case) */
  def sort_key(c: Column, comparator: String = "default"): Column =
    column(GraphdSortKey(expression(c), comparator))

  /** value-HMAP normalization key (pdb_hmap_value_normalize) */
  def value_norm(c: Column): Column = column(GraphdValueNorm(expression(c)))

  /** the reference's `~=` operator */
  def gmatch(value: Column, pattern: Column, comparator: String = "default"): Column =
    column(GraphdMatch(expression(value), expression(pattern), comparator))

  /** word segmentation (backs the inverted word index) */
  def graphd_words(c: Column): Column = column(GraphdWords(expression(c)))

  /** codegen'd double-math dot product of two numeric array columns */
  def vec_dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))

  /** codegen'd double-math L2 norm of a numeric array column */
  def vec_norm(a: Column): Column = column(VecNorm(expression(a)))

  /** register SQL functions graphd_sort_key / graphd_match */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graphd_sort_key",
      exprs => GraphdSortKey(exprs.head,
        exprs.lift(1).map(_.eval(null).toString).getOrElse("default")),
      "builtin")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graphd_match", exprs => GraphdMatch(exprs.head, exprs(1)), "builtin")
  }
}
