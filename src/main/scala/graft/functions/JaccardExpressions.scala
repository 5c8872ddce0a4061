package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** jaccard_sorted_ge(a, b): exact set Jaccard |A∩B| / |A∪B| of two
  * SORTED-ASCENDING, DISTINCT int-array columns when the result can
  * still reach `tau`, and -1.0 the moment it provably cannot.
  *
  * This is the thresholded-verify kernel of the near-dup family
  * (dd_chargram_pairs' packed path): the portable formulation —
  * `size(array_intersect)/size(array_union) >= tau` — always pays the
  * FULL intersection (a hash set build plus probe per pair, boxed
  * elements), even for the overwhelming majority of candidate pairs
  * that die at the threshold. On pre-sorted primitive arrays the same
  * counts come from a branchy two-pointer merge in registers, and the
  * threshold admits a sound early exit: at any merge position,
  *   bestInter = inter + min(remaining_a, remaining_b)
  * bounds the final intersection from above, so
  *   bestJ = bestInter / (|A| + |B| - bestInter)
  * bounds the final Jaccard. The exit compares bestJ with THE SAME
  * IEEE double division the surviving pairs' jaccard is computed with:
  * |A∩B| ≤ bestInter and |A∪B| ≥ |A|+|B|-bestInter as integers, and
  * double division is monotone in the numerator and antitone in the
  * denominator over positives, so double(J) ≤ double(bestJ) — if
  * bestJ < tau the pair could never pass the `>= tau` filter, making
  * the early exit answer-preserving by construction (no epsilon, no
  * cross-multiplication rounding argument).
  *
  * Contract (the caller guarantees, the engine's operators do):
  *  - both arrays sorted ascending with distinct elements (array_sort
  *    over packGram output — packing is bijective on its gated
  *    domain, so sorted-distinct ints ⟺ distinct string grams);
  *    unsorted or duplicated input yields an UNSPECIFIED result (the
  *    merge never errors, it just counts wrong) — stated in the
  *    registered usage string, enforceable only by the caller;
  *  - tau > 0 (a non-positive tau would make -1.0 collide with
  *    legitimately-kept values).
  * NULL ELEMENTS are handled, not assumed away (the function is on
  * the public SQL surface, where ArrayData.getInt on a null slot
  * would read garbage silently): when either input's TYPE admits
  * null elements (containsNull — a static property, so the check
  * costs nothing on the engine's own containsNull=false columns), a
  * pre-scan returns SQL NULL for any row actually holding one — the
  * set-jaccard of a set with an unknown member is unknown.
  * Survivors return the bit-identical jaccard of the portable
  * formulation; non-survivors return -1.0 and are dropped by the same
  * `>= tau` filter, so swapping this kernel in is invisible to the
  * DuckDB oracle.
  */
case class SortedJaccardGe(left: Expression, right: Expression, tau: Double)
    extends BinaryExpression {
  override def prettyName: String = "jaccard_sorted_ge"
  override def dataType: DataType = DoubleType

  /** Static per-plan fact: may either input hold null ELEMENTS? False
    * for every internal call site (packGram arrays), so the hot path
    * compiles with no null machinery at all. */
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  }
  private lazy val nullScanNeeded: Boolean =
    elemNullable(left) || elemNullable(right)
  override def nullable: Boolean =
    left.nullable || right.nullable || nullScanNeeded

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    if (ok(left.dataType) && ok(right.dataType) && tau > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> inputs and tau > 0, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}, tau=$tau")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    if (nullScanNeeded) {
      var t = 0
      while (t < na) { if (x.isNullAt(t)) return null; t += 1 }
      t = 0
      while (t < nb) { if (y.isNullAt(t)) return null; t += 1 }
    }
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val xa = x.getInt(i); val yb = y.getInt(j)
      if (xa == yb) { inter += 1; i += 1; j += 1 }
      else {
        // a mismatch is the only step that lowers the reachable
        // intersection (a match moves inter and min(rem) in lockstep),
        // so the exit test lives here
        if (xa < yb) i += 1 else j += 1
        val best = inter + math.min(na - i, nb - j)
        if (best.toDouble / (na + nb - best) < tau) return -1.0
      }
    }
    val jac = inter.toDouble / (na + nb - inter)
    if (jac >= tau) jac else -1.0
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val best = ctx.freshName("best")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      val jac = ctx.freshName("jac"); val out = ctx.freshName("out")
      val cut = ctx.freshName("cut"); val t = ctx.freshName("t")
      // static gate: the null-element pre-scan is compiled in only
      // when a type admits null elements — internal columns
      // (containsNull=false) get byte-identical code to before
      val nullScan = if (!nullScanNeeded) "" else
        s"""
           |int $t = 0;
           |while ($t < $na) {
           |  if ($a.isNullAt($t)) { ${ev.isNull} = true; break; } $t++;
           |}
           |$t = 0;
           |while (!${ev.isNull} && $t < $nb) {
           |  if ($b.isNullAt($t)) { ${ev.isNull} = true; break; } $t++;
           |}
         """.stripMargin
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |double $out = -1.0;
         |boolean $cut = false;
         |$nullScan
         |while (!${ev.isNull} && $i < $na && $j < $nb) {
         |  final int $xa = $a.getInt($i);
         |  final int $yb = $b.getInt($j);
         |  if ($xa == $yb) { $inter++; $i++; $j++; }
         |  else {
         |    if ($xa < $yb) { $i++; } else { $j++; }
         |    final int $best = $inter + java.lang.Math.min($na - $i, $nb - $j);
         |    if ((double) $best / ($na + $nb - $best) < $tau) {
         |      $cut = true;
         |      break;
         |    }
         |  }
         |}
         |if (!$cut) {
         |  final double $jac = (double) $inter / ($na + $nb - $inter);
         |  if ($jac >= $tau) { $out = $jac; }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardGe =
    copy(left = l, right = r)
}
