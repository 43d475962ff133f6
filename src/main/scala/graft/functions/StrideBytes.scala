package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Every `factor`-th byte of a binary payload, as binary — ONE O(n)
  * array pass per row. The Column-composition alternative (`aggregate`
  * over an index sequence folding binary `concat`) copies the whole
  * accumulator on every step — O(n²/factor) bytes per row, which on
  * megabyte media payloads turns a stub resize into the pipeline
  * bottleneck. Byte-exact for arbitrary (non-UTF8) content; an empty
  * payload yields an empty payload; null propagates. */
case class StrideBytes(child: Expression, factor: Int)
  extends UnaryExpression with CodegenFallback {

  require(factor >= 1, "factor must be positive")
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_stride_bytes"

  override protected def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[Array[Byte]]
    val out = new Array[Byte]((in.length + factor - 1) / factor)
    var i = 0
    var o = 0
    while (i < in.length) { out(o) = in(i); o += 1; i += factor }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StrideBytes {
  def strideBytes(c: Column, factor: Int): Column =
    ColumnBridge.column(StrideBytes(ColumnBridge.expression(c), factor))
}
