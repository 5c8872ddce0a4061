package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** char_ngrams(t, n): every length-n character window of `t`, in
  * position order — the sliding-gram generator of the text/dedup
  * family (trigram LM, n-gram profiles, char-gram shingles).
  *
  * Exact drop-in for the HOF formulation the call sites used through
  * round 16,
  *   transform(sequence(1, greatest(length(t) - (n-1), 1)),
  *             i -> substr(t, i, n))
  * including its short-string edge: when t has fewer than n chars the
  * result is ONE element holding all of t (substr(t, 1, n) of a short
  * string), so empty text yields [""] exactly as before.
  *
  * Why it exists (guide §1.2 step 2 — per-task work): the HOF chain
  * evaluates one INTERPRETED lambda call per window, and each
  * substr(t, i, n) re-scans the string from byte 0 to find the i-th
  * code point (UTF8String counts code points, not bytes), so gram
  * generation over a document of L chars costs O(L²) byte scans plus
  * L boxed lambda frames. This expression walks the UTF-8 code-point
  * offsets ONCE (O(L)), emits each window as a byte-range slice over
  * one private copy of the string's bytes, and compiles to a single
  * static call inside whole-stage codegen. Measured at sf0.1 on
  * tx_lm_score's train pass: the explode+agg stage's task time drops
  * ~6× (numbers in OPTIMIZATION_r17.md).
  *
  * Result strings are byte-identical to substr's output (same
  * code-point windows), so gram COUNTS — the only thing any caller
  * consumes — are untouched and every oracle stays bit-exact.
  */
object CharNgrams {
  /** One O(L) pass: collect code-point byte offsets, slice windows.
    * `bytes` is getBytes' result — either a fresh copy (offset-based
    * strings: UnsafeRow / columnar readers) or the string's own
    * immutable full array (fromString/fromBytes products); both are
    * safe to alias from the returned slices because no Spark producer
    * mutates a full-span array it handed to a UTF8String. */
  def compute(t: UTF8String, n: Int): ArrayData = {
    val bytes = t.getBytes
    val nb = bytes.length
    val starts = new Array[Int](nb + 1)
    var nc = 0
    var off = 0
    while (off < nb) {
      starts(nc) = off
      nc += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    // malformed UTF-8 can overshoot the last char's declared width;
    // clamp so the final slice never reads past the buffer (substr's
    // own offset walk is clamped the same way)
    starts(nc) = nb
    if (nc < n) return new GenericArrayData(Array[Any](t))
    val out = new Array[Any](nc - n + 1)
    var i = 0
    while (i <= nc - n) {
      val s = starts(i)
      val e = math.min(starts(i + n), nb)
      out(i) = UTF8String.fromBytes(bytes, s, e - s)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "char_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and n >= 1, got " +
        s"${child.dataType.catalogString}, n=$n")

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}
