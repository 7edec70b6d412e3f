package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Polynomial rolling hash of a string: fold over code points of
  * `(acc * base + cp) % mod`, starting from acc = 0.
  *
  * The fold is over UNICODE CODE POINTS — matching the DuckDB oracle's
  * `list_reduce(list_transform(string_split(s, ''), c -> ascii(c)),
  * (a, b) -> (a*31 + b) % P)` for ALL input (DuckDB is UTF-8 native: its
  * string_split('') yields whole code points and ascii() their scalar
  * values; asserted for the supplementary plane in ExpressionsSpec).
  * Spark's own `aggregate(split(s, ""), 0L, (acc, c) => (acc*31 +
  * ascii(c)) % P)` is equivalent only for BMP text — split("") cuts
  * UTF-16 SURROGATE HALVES for supplementary characters, diverging from
  * both this expression and the oracle. Codegen'd as one tight loop
  * instead of an interpreted per-character fold (StringSplit allocates
  * a per-char array and ArrayAggregate re-evaluates a lambda tree per
  * element; on the MinHash shingle path that was the whole benchmark).
  *
  * ASCII fast path iterates raw UTF8 bytes; multi-byte strings fall back
  * to a Java String code-point walk (same values as ascii()/DuckDB ascii,
  * which are code-point based).
  */
case class StringPolyHash(
    child: Expression,
    base: Long = 31L,
    mod: Long = 1000000007L,
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    StringPolyHash.hash(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.StringPolyHash.hash($s, ${base}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): StringPolyHash =
    copy(child = newChild)

  override def prettyName: String = "string_poly_hash"
}

object StringPolyHash {
  /** Static kernel shared by eval and generated code. */
  def hash(s: UTF8String, base: Long, mod: Long): Long = {
    val n = s.numBytes()
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    var ascii = true
    while (i < n && ascii) {
      val b = bytes(i)
      if ((b & 0x80) != 0) ascii = false
      else {
        acc = (acc * base + (b & 0xff)) % mod
        i += 1
      }
    }
    if (ascii) acc
    else {
      // Multi-byte: restart with a code-point walk for ascii()-compatible
      // values on non-ASCII text.
      val str = s.toString
      acc = 0L
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * base + cp) % mod
        j += Character.charCount(cp)
      }
      acc
    }
  }
}
