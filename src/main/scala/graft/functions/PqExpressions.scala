package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the PQ hot path (encode + ADC).
  *
  * The portable formulation is nested `transform`/`aggregate`
  * higher-order functions — correct, but HOFs are CodegenFallback:
  * every one of the 8×16×8 multiply-adds per row runs an interpreted
  * lambda with boxed doubles, and the encode pass is exactly the stage
  * that touches every corpus vector. These expressions generate the
  * same arithmetic as a tight primitive loop inside whole-stage
  * codegen — the identical double math and first-minimum tie rule as
  * the HOF form (element cast to double, left-fold accumulation,
  * strict `<` argmin), so swapping them in moves no result the recall
  * contracts can see.
  *
  * The trained codebook rides along as a flat `float[1024]` constructor
  * argument (subspace-major: `cb[(m*16 + c)*8 + d]`), shipped once per
  * task in the serialized expression — never a per-row literal.
  */
object PqExpressions {
  val Subspaces = 8
  val Centroids = 16
  val SubDim = 8

  /** Flatten the nested codebook into the layout the expressions index. */
  def flatten(cb: Seq[Seq[Seq[Float]]]): Array[Float] = {
    val out = new Array[Float](Subspaces * Centroids * SubDim)
    var m = 0
    while (m < Subspaces) {
      var c = 0
      while (c < Centroids) {
        var d = 0
        while (d < SubDim) {
          out((m * Centroids + c) * SubDim + d) = cb(m)(c)(d)
          d += 1
        }
        c += 1
      }
      m += 1
    }
    out
  }
}

/** pq_encode(embedding): the 8 per-subspace argmin centroid codes. */
case class PqEncode(child: Expression, cb: Array[Float]) extends UnaryExpression {
  import PqExpressions._

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double>, got ${dt.catalogString}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](Subspaces)
    var m = 0
    while (m < Subspaces) {
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < Centroids) {
        var dist = 0.0
        var d = 0
        while (d < SubDim) {
          val i = m * SubDim + d
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          val t = x - cb((m * Centroids + c) * SubDim + d)
          dist += t * t
          d += 1
        }
        if (dist < bd) { bd = dist; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bd = ctx.freshName("bd")
      val dist = ctx.freshName("dist"); val t = ctx.freshName("t")
      s"""
         |int[] $codes = new int[$Subspaces];
         |for (int $m = 0; $m < $Subspaces; $m++) {
         |  int $best = 0; double $bd = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $Centroids; $c++) {
         |    double $dist = 0.0;
         |    for (int $d = 0; $d < $SubDim; $d++) {
         |      double $t = (double)$v.$getter($m * $SubDim + $d)
         |        - (double)$cbRef[($m * $Centroids + $c) * $SubDim + $d];
         |      $dist += $t * $t;
         |    }
         |    if ($dist < $bd) { $bd = $dist; $best = $c; }
         |  }
         |  $codes[$m] = $best;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** pq_adc(qe, codes): asymmetric distance — true query subvectors vs
  * the candidate's reconstructed centroids. */
case class PqAdc(left: Expression, right: Expression, cb: Array[Float])
    extends BinaryExpression {
  import PqExpressions._

  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<int>), " +
        s"got ${l.catalogString}, ${r.catalogString}")
  }

  private def isFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, co: Any): Any = {
    val qe = q.asInstanceOf[ArrayData]
    val codes = co.asInstanceOf[ArrayData]
    var acc = 0.0
    var m = 0
    while (m < Subspaces) {
      val c = codes.getInt(m)
      var d = 0
      while (d < SubDim) {
        val i = m * SubDim + d
        val x = if (isFloat) qe.getFloat(i).toDouble else qe.getDouble(i)
        val t = x - cb((m * Centroids + c) * SubDim + d)
        acc += t * t
        d += 1
      }
      m += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (q, co) => {
      val acc = ctx.freshName("acc"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val d = ctx.freshName("d"); val t = ctx.freshName("t")
      s"""
         |double $acc = 0.0;
         |for (int $m = 0; $m < $Subspaces; $m++) {
         |  int $c = $co.getInt($m);
         |  for (int $d = 0; $d < $SubDim; $d++) {
         |    double $t = (double)$q.$getter($m * $SubDim + $d)
         |      - (double)$cbRef[($m * $Centroids + $c) * $SubDim + $d];
         |    $acc += $t * $t;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}
