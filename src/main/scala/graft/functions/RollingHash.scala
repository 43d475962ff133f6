package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Rabin-Karp rolling hash over a binary payload: the polynomial hash
  * h(i) = Σ_j byte(i+j)·B^(w-1-j) mod P for every window start i,
  * computed INCREMENTALLY in O(n) (slide: h' = (h − lead·B^(w-1))·B +
  * next, mod P) — the content-defined-chunking primitive (chunk
  * boundaries = windows whose hash ≡ 0 mod a divisor) that makes
  * byte-level dedup robust to insertions, unlike fixed-offset framing.
  * Returns one long per window (empty array when the payload is
  * shorter than the window). The direct per-window formula is
  * SQL-replicable, so results are oracle-checkable. */
case class RollingHash(child: Expression, window: Int)
  extends UnaryExpression with CodegenFallback {

  require(window >= 1 && window <= 64, "window must be in [1, 64]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_hash"

  import RollingHash.{B, P}
  private val leadPow: Long = {
    var p = 1L; var i = 0
    while (i < window - 1) { p = p * B % P; i += 1 }
    p
  }

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n < window) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var i = 0
    while (i < window) { h = (h * B + (bytes(i) & 0xff)) % P; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - window) {
      h = ((h - (bytes(i - 1) & 0xff) * leadPow % P + P) % P * B +
        (bytes(i + window - 1) & 0xff)) % P
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Polynomial base and modulus (prime; keeps every intermediate far
    * from int64 overflow so the SQL oracle's BIGINT math agrees). */
  val B = 257L
  val P = 1000000007L

  def rollingHash(c: Column, window: Int): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), window))
}
