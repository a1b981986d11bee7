package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial (Rabin–Karp) rolling hash over a document's UTF-8 bytes —
  * native Catalyst expressions with `doGenCode`, so document fingerprinting
  * stays inside whole-stage codegen (a Scala UDF here would break the
  * codegen span and serialize every row).
  *
  * `PolyHash` is the whole-document fingerprint: h = Σ b_i · 31^(n-1-i)
  * (mod 2^64, wraparound arithmetic).
  *
  * `MinWindowHash(k)` is the winnowing-style content fingerprint: the
  * minimum polynomial hash over all k-byte windows, computed with the O(n)
  * rolling update h' = h·31 − b_out·31^k + b_in. Two documents sharing any
  * k-byte run agree on window hashes, so near-identical texts get close
  * fingerprint sets; the minimum is a cheap 1-value sketch of that set.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

case class MinWindowHash(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, "window size must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_min_window_hash"

  // 31^k mod 2^64, for evicting the outgoing byte.
  private val powK: Long = {
    var p = 1L
    var i = 0
    while (i < k) { p *= 31L; i += 1 }
    p
  }

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    var h = 0L
    var i = 0
    if (n < k) { // shorter than one window: whole-text hash
      while (i < n) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
      h
    } else {
      while (i < k) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
      var min = h
      while (i < n) {
        h = h * 31L - (bytes(i - k) & 0xffL) * powK + (bytes(i) & 0xffL)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |int $i = 0;
         |if ($bytes.length < $k) {
         |  for (; $i < $bytes.length; $i++) { $h = $h * 31L + ($bytes[$i] & 0xffL); }
         |  ${ev.value} = $h;
         |} else {
         |  for (; $i < $k; $i++) { $h = $h * 31L + ($bytes[$i] & 0xffL); }
         |  long $min = $h;
         |  for (; $i < $bytes.length; $i++) {
         |    $h = $h * 31L - ($bytes[$i - $k] & 0xffL) * ${powK}L + ($bytes[$i] & 0xffL);
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinWindowHash =
    copy(child = newChild)
}

