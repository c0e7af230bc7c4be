package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
  // actual checks, not a blanket Success: a wrong-typed input must fail
  // ANALYSIS, not crash codegen/eval with a ClassCastException
  override def checkInputDataTypes() = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graphd_sort_key expects a string input, got $other")
  }

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
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graphd_match expects (string, string) inputs, got $other")
    }

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
  override def checkInputDataTypes() = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graphd_words expects a string input, got $other")
  }

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
  override def checkInputDataTypes() = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graphd_value_norm expects a string input, got $other")
  }

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
  // int/long arrays would silently read misaligned words through the
  // UnsafeArrayData double accessors — reject at analysis
  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects float/double array inputs, got $other")
    }
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
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects a float/double array input, got $other")
  }
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

/** The `n` nearest centroids (squared-L2 ascending, centroid-id
  * ascending tiebreak) of a numeric array column — the IVF
  * coarse-quantizer assignment. The centroid table rides inside the
  * expression (serialized with the task closure, surfaced to codegen
  * via addReferenceObj), so assignment is a pure projection: one
  * compiled scan, no join, no UDF codegen barrier. Each distance is
  * the same left-to-right sum-of-squared-diffs fold the SQL
  * `aggregate(zip_with(...))` form computes — identical doubles,
  * identical ranking, so assignments stay engine-portable.
  */
case class VecNearestCids(child: Expression, cents: Array[(Int, Array[Double])],
    n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_nearest expects a float/double array input, got $other")
  }
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val table = CentroidTable(cents)

  override protected def nullSafeEval(a: Any): Any =
    table.nearest(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], isFloat, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("cents", table,
      "graft.functions.CentroidTable")
    val (f, k) = (isFloat.toString, n.toString)
    defineCodeGen(ctx, ev, a => s"$tab.nearest($a, $f, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNearestCids =
    copy(child = newChild)
}

/** flattened centroid matrix + id vector — one compiled nearest-n scan
  * per row (insertion select, O(nlist·n); n is 1..nprobe, tiny)
  */
final case class CentroidTable(cents: Array[(Int, Array[Double])])
    extends Serializable {
  private val cids: Array[Int] = cents.map(_._1)
  private val dims: Int = if (cents.isEmpty) 0 else cents(0)._2.length
  private val flat: Array[Double] = {
    val out = new Array[Double](cents.length * dims)
    var c = 0
    while (c < cents.length) {
      System.arraycopy(cents(c)._2, 0, out, c * dims, dims)
      c += 1
    }
    out
  }

  def nearest(v: org.apache.spark.sql.catalyst.util.ArrayData,
      isFloat: Boolean, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = math.min(n, cids.length)
    val bestD = new Array[Double](k)
    val bestC = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < cids.length) {
      var s = 0.0
      var i = 0
      val off = c * dims
      val m = math.min(dims, v.numElements())
      while (i < m) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val d = x - flat(off + i)
        s += d * d
        i += 1
      }
      // insertion into the (d2 asc, cid asc) top-k; ties keep the
      // earlier (smaller) cid because cents are cid-sorted on entry
      var pos = filled
      while (pos > 0 && (bestD(pos - 1) > s ||
          (bestD(pos - 1) == s && bestC(pos - 1) > cids(c)))) pos -= 1
      if (pos < k) {
        val last = math.min(filled, k - 1)
        var j = last
        while (j > pos) { bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1 }
        bestD(pos) = s
        bestC(pos) = cids(c)
        if (filled < k) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestC, filled).map(Int.box(_): Any))
  }
}

/** Bloom-filter membership probe over a string column. The filter
  * rides inside the expression (task-closure serialized, surfaced to
  * codegen via addReferenceObj) so the probe is a pure compiled
  * projection — no join, no UDF codegen barrier. `false` is definitive
  * (no false negatives); `true` means "might", so exact consumers must
  * confirm positives (see Dedup.incrementalNew — the filter prunes the
  * shuffle, a confirming anti-join keeps the semantics exact).
  */
case class BloomProbe(child: Expression,
    bf: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes() = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects a string input, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bf,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
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

  /** the n nearest centroid ids of a numeric array column (L2 asc,
    * cid asc) — IVF assignment as a compiled projection
    */
  def vec_nearest(a: Column, cents: Array[(Int, Array[Double])], n: Int): Column =
    column(VecNearestCids(expression(a), cents, n))

  /** compiled Bloom membership probe of a string column (false is
    * definitive-absent; true needs exact confirmation)
    */
  def bloom_probe(c: Column,
      bf: org.apache.spark.util.sketch.BloomFilter): Column =
    column(BloomProbe(expression(c), bf))

  /** per-group bounded top-k aggregate (graphd-sort-root.c analog):
    * the k smallest elements in the element type's natural ascending
    * order, with map-side partial reduction to k rows per group
    */
  def bounded_top_k(c: Column, k: Int): Column =
    column(BoundedTopK(expression(c), k).toAggregateExpression())

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
