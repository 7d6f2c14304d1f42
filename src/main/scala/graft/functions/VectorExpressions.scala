package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Vector math as native Catalyst expressions with whole-stage codegen.
  *
  * This is the hot path of flat (exact brute-force) vector search — the
  * reference's FlatIndex.query scans every stored vector per query
  * (vector_db_query.py:143-161 over the flat index written at
  * vector_db_creator.py:212-216). At 100 TB the scan is distributed and
  * the per-row cost is one fused dot-product loop inside
  * WholeStageCodegen — no UDF boxing, no per-element Object allocation.
  *
  * All expressions accept `array<float>` or `array<double>` children and
  * compute in double with sequential accumulation (deterministic per row;
  * partitioning cannot change summation order — SURVEY.md §7.4).
  */
private[graft] object VectorExprUtils {
  def elementType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }
  def checkVec(name: String, exprs: Expression*): TypeCheckResult = {
    val ok = exprs.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> or array<double> arguments, got " +
        exprs.map(_.dataType.simpleString).mkString(", "))
  }
  /** Java accessor snippet for element i of an ArrayData of the given
    * element type, widened to double. */
  def getter(arr: String, et: DataType, i: String): String = et match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }
  @inline def get(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
}

/** dot(x, y) — inner product in double precision. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExprUtils._
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec("dot_product", left, right)
  private lazy val (lt, rt) = (elementType(left), elementType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(x, lt, i) * get(y, rt, i); i += 1 }
    dot
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("dot")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(x, lt, i)} * ${getter(y, rt, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_similarity(x, y) = dot / (||x|| * ||y||); 0.0 when either norm
  * is zero (matches the safe-division convention of the reference's
  * normalized-embedding path — embedding_models.py:122 normalizes at
  * encode time so stored vectors have unit norm and cos == dot). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExprUtils._
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec("cosine_similarity", left, right)
  private lazy val (lt, rt) = (elementType(left), elementType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = get(x, lt, i); val yi = get(y, rt, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = ${getter(x, lt, i)};
         |  double $yi = ${getter(y, rt, i)};
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / Math.sqrt($nx * $ny);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** euclidean_distance(x, y) = sqrt(sum((xi-yi)^2)) — the "l2" metric
  * branch of vector_db_query.py:180-185. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExprUtils._
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec("euclidean_distance", left, right)
  private lazy val (lt, rt) = (elementType(left), elementType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = get(x, lt, i) - get(y, rt, i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(x, lt, i)} - ${getter(y, rt, i)};
         |  $s += $d * $d;
         |}
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_normalize(x) — returns x / ||x|| as array<float> (identity for the
  * zero vector). The reference normalizes at encode time
  * (embedding_models.py:122 `normalize_embeddings=True`); storing unit
  * vectors makes cosine similarity a plain dot product at query time. */
case class L2Normalize(child: Expression) extends UnaryExpression {
  import VectorExprUtils._
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkVec("l2_normalize", child)
  private lazy val et = elementType(child)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val v = get(x, et, i); s += v * v; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      out(i) = if (norm == 0.0) get(x, et, i).toFloat else (get(x, et, i) / norm).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
  // Interpreted eval is fine here: normalization runs once per row at
  // ingest, never in the per-query scan loop.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("l2norm", this, classOf[L2Normalize].getName)
      s"(org.apache.spark.sql.catalyst.util.ArrayData)$self.nullSafeEval($c)"
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lsh_bucket(x, numPlanes) — sign-bucket id of a vector under
  * `numPlanes` deterministic pseudo-random hyperplanes (bit p set iff
  * dot(x, plane_p) >= 0). Plane components come from the splitmix-style
  * `SimilaritySearch.planeComponent(p, d)` formula, recomputed on the
  * fly — no stored matrix, any executor/SQL oracle regenerates it.
  *
  * Exists because the composed-column form (numPlanes × dim
  * `element_at` nodes) is a 300-500-node expression tree: janino spends
  * seconds compiling it and every element is re-fetched per plane. This
  * is one codegen node with a fused two-level loop — O(planes·dim) with
  * one array read per (p,d) and negligible compile cost. */
case class LshBucket(child: Expression, numPlanes: Int) extends UnaryExpression {
  import VectorExprUtils._
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = checkVec("lsh_bucket", child)
  private lazy val et = elementType(child)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var proj = 0.0; var d = 0
      while (d < n) { proj += get(x, et, d) * LshBucket.planeComponent(p, d); d += 1 }
      if (proj >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val b = ctx.freshName("bucket"); val proj = ctx.freshName("proj")
      val cls = classOf[LshBucket].getName
      s"""
         |int $n = $x.numElements();
         |long $b = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $proj = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $proj += ${getter(x, et, d)} * $cls.planeComponent($p, $d);
         |  }
         |  if ($proj >= 0.0) $b |= (1L << $p);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshBucket {
  /** Static (Java-callable from generated code) splitmix64-style plane
    * component — the single source of truth; SimilaritySearch delegates
    * here and the SQL oracles emit these values as literals. */
  def planeComponent(plane: Int, d: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }
}

/** Affine row kernel: `out(j) = Σ_i x(i)·rows(j)(i) − offsets(j)` in
  * ONE expression call per input row. The matrix rides as a JVM
  * reference object (the [[PqKernel]] pattern) — the per-component
  * `dot_product(v, array(<dim> literals))` form this replaces built a
  * fresh boxed literal array per (row, component), which measured as
  * 84 of pca_ann's 90 s at sf10. Each output element accumulates in
  * ascending index order with one IEEE multiply+add — bit-identical
  * to the [[DotProduct]]-minus-literal chain. Rows shorter than a
  * matrix row read as the DotProduct min-length prefix. */
final class MatVecKernel(val rows: Array[Array[Double]],
    val offsets: Array[Double]) extends Serializable {
  require(rows.length == offsets.length, "one offset per matrix row")
  def apply(x: ArrayData, isFloat: Boolean): ArrayData = {
    val out = new Array[Any](rows.length)
    val xn = x.numElements()
    var j = 0
    while (j < rows.length) {
      val r = rows(j)
      val n = math.min(xn, r.length)
      var acc = 0.0; var i = 0
      if (isFloat) while (i < n) { acc += x.getFloat(i).toDouble * r(i); i += 1 }
      else while (i < n) { acc += x.getDouble(i) * r(i); i += 1 }
      out(j) = acc - offsets(j); j += 1
    }
    new GenericArrayData(out)
  }
  override def equals(o: Any): Boolean = o match {
    case k: MatVecKernel =>
      java.util.Arrays.deepEquals(
        k.rows.asInstanceOf[Array[AnyRef]], rows.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(k.offsets, offsets)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.deepHashCode(rows.asInstanceOf[Array[AnyRef]]) * 31 +
      java.util.Arrays.hashCode(offsets)
}

/** mat_vec(vec) → array<double> of per-row affine projections. */
case class MatVecProject(child: Expression, kernel: MatVecKernel)
    extends UnaryExpression {
  import VectorExprUtils._
  override def prettyName: String = "mat_vec"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, child)
  private lazy val isFloat: Boolean = elementType(child) == FloatType
  override def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecKernel", kernel,
      classOf[MatVecKernel].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.apply($x, $isFloat);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-level API + SQL registration for the vector expressions. */
object VectorFunctions {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def dotProduct(x: Column, y: Column): Column = col(DotProduct(ex(x), ex(y)))
  def matVec(x: Column, rows: Array[Array[Double]],
      offsets: Array[Double]): Column =
    col(MatVecProject(ex(x), new MatVecKernel(rows, offsets)))
  def cosineSimilarity(x: Column, y: Column): Column = col(CosineSimilarity(ex(x), ex(y)))
  def cosineDistance(x: Column, y: Column): Column =
    org.apache.spark.sql.functions.lit(1.0) - cosineSimilarity(x, y)
  def euclideanDistance(x: Column, y: Column): Column = col(EuclideanDistance(ex(x), ex(y)))
  def l2Normalize(x: Column): Column = col(L2Normalize(ex(x)))

  /** Register SQL names so `spark.sql("... cosine_similarity(a,b) ...")`
    * works (idempotent; per-session). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("euclidean_distance", es => EuclideanDistance(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es(0)), "built-in")
  }
}
