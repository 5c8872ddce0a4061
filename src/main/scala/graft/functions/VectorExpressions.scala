package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The portable formulation of a dot product over `array<float>` is the
  * `aggregate` higher-order function — correct, but HOFs evaluate one
  * interpreted lambda call per element with boxed accumulators. At
  * similarity-search scale (rows × dim × candidates multiplications)
  * that interpreter overhead dominates the scan. These expressions
  * generate a tight primitive loop inside whole-stage codegen instead:
  * no per-element virtual calls, no boxing, accumulation in a register.
  *
  * Determinism contract (same as VectorFunctions): elements are cast
  * to double before arithmetic and accumulated as a left fold in index
  * order, one accumulator per quantity — bit-identical to both the
  * `aggregate`-HOF formulation and the DuckDB `list_reduce` oracle, so
  * swapping these in changes nothing the correctness gate can see.
  *
  * Both float and double element types are supported (embeddings are
  * float32 on disk; L2-normalized factor vectors are double).
  */
trait VecBinaryBase extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemGetter(et: DataType): String = et match {
    case FloatType => "getFloat"
    case _         => "getDouble"
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
}

/** vec_dot(a, b): Σ a[i]·b[i] over the common prefix length. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryBase {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (gl, gr) = (elemGetter(elemType(left)), elemGetter(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.$gl($i) * (double)$b.$gr($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** vec_cosine(a, b): Σab / (√Σaa · √Σbb), one pass, three independent
  * left-fold accumulators (bit-equal to three separate folds). */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryBase {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (gl, gr) = (elemGetter(elemType(left)), elemGetter(elemType(right)))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double)$a.$gl($i);
         |  double $yi = (double)$b.$gr($i);
         |  $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |}
         |${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** vec_sign_bucket(emb, dim, nPlanes, offset): the random-hyperplane
  * LSH signature as ONE expression node.
  *
  * The SQL formulation inlines the ±1 plane matrix as literals —
  * nPlanes · dim literal doubles plus a CreateArray and a vec_dot per
  * plane. At the banded-signature sizes the ANN queries use (12 bands
  * × adaptive planes × 64 dims ≈ 4.6k literals) the driver pays for
  * that tree on every analysis, optimization, and Janino compile,
  * which is measurable wall-clock on EVERY query run regardless of
  * data size. Here the matrix lives in ONE reference object (computed
  * once per plan from the same deterministic md5 parity stream —
  * planeCoeffs — that the SQL literals and the DuckDB oracle use) and
  * the codegen is a tight two-level loop.
  *
  * Determinism contract: per plane, a left fold over elements in index
  * order with a double accumulator — bit-identical to
  * `vec_dot(emb, array(<literals>))` and to the DuckDB `list_reduce`
  * rendering, so swapping this in changes nothing any oracle can see.
  * NaN projections sign to '0' in all three formulations
  * (`NaN >= 0` is false in Java, Spark SQL, and DuckDB).
  */
case class VecSignBucket(child: Expression, dim: Int, nPlanes: Int, offset: Int)
    extends UnaryExpression {
  override def prettyName: String = "vec_sign_bucket"
  override def dataType: DataType = StringType

  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes) { j =>
      VectorFunctions.planeCoeffs(offset + j, dim).map(_.toDouble).toArray
    }

  private def elemFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> input, " +
        s"got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val ft = elemFloat
    val n = math.min(x.numElements(), dim)
    val bits = new Array[Byte](nPlanes)
    var j = 0
    while (j < nPlanes) {
      val pl = planes(j)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (ft) x.getFloat(i).toDouble else x.getDouble(i)) * pl(i)
        i += 1
      }
      bits(j) = if (acc >= 0) '1' else '0'
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(bits)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("signPlanes", planes, "double[][]")
    val getter = if (elemFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val bits = ctx.freshName("bits")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val pl = ctx.freshName("pl")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |byte[] $bits = new byte[$nPlanes];
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  double[] $pl = $planesRef[$j];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double)$a.$getter($i) * $pl[$i];
         |  }
         |  $bits[$j] = $acc >= 0 ? (byte)'1' : (byte)'0';
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($bits);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): VecSignBucket =
    copy(child = c)
}
