package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse 15 hex characters of a string, starting at 0-based byte
  * offset `from`, into an unsigned 60-bit long — the codegen'd
  * replacement for `conv(substring(h, from+1, 15), 16, 10)
  * .cast("long")` in the md5-derived hash family ([[Hashing.hash60]],
  * the Carter-Wegman minhash slices, the forest's bootstrap draws).
  * Spark's `Conv` routes every call through NumberConverter's
  * byte-array radix machinery plus a decimal-string round-trip and a
  * string→long cast; this is 15 shift-adds per value on the hot path.
  * Bit-identical to the conv form on every valid input (HashingSpec
  * pins the equivalence against hash60Jvm's value sweep); inputs are
  * md5 hex output by contract, so a short string or a non-hex byte
  * fails loudly instead of guessing. */
case class HexSlice60(child: Expression, from: Int) extends UnaryExpression {

  require(from >= 0, "from must be a non-negative byte offset")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hex60"

  override protected def nullSafeEval(v: Any): Any =
    HexSlice60.parse(v.asInstanceOf[UTF8String], from)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      s"""
         |if ($v.numBytes() < ${from + 15}) {
         |  throw new IllegalArgumentException(
         |    "graft_hex60: input shorter than ${from + 15} bytes");
         |}
         |long $h = 0L;
         |for (int $i = 0; $i < 15; $i++) {
         |  int $c = ((int) $v.getByte($from + $i)) & 0xff;
         |  int $d;
         |  if ($c >= '0' && $c <= '9') { $d = $c - '0'; }
         |  else if ($c >= 'a' && $c <= 'f') { $d = $c - 'a' + 10; }
         |  else if ($c >= 'A' && $c <= 'F') { $d = $c - 'A' + 10; }
         |  else { throw new IllegalArgumentException(
         |    "graft_hex60: non-hex byte in input"); }
         |  $h = ($h << 4) | $d;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HexSlice60 {

  /** Interpreted mirror of the generated loop. */
  def parse(s: UTF8String, from: Int): Long = {
    require(s.numBytes() >= from + 15,
      s"graft_hex60: input shorter than ${from + 15} bytes")
    var h = 0L
    var i = 0
    while (i < 15) {
      val c = (s.getByte(from + i) & 0xff).toChar
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else throw new IllegalArgumentException(
          "graft_hex60: non-hex byte in input")
      h = (h << 4) | d
      i += 1
    }
    h
  }

  /** 60-bit slice of a hex-string column; `start1` is the 1-based
    * character position `conv(substring(c, start1, 15), 16, 10)` used
    * (hex strings are ASCII, so char position == byte offset + 1). */
  def slice(c: Column, start1: Int): Column =
    ColumnBridge.column(HexSlice60(ColumnBridge.expression(c), start1 - 1))
}
