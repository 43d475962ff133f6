package graft

import graft.functions.{DotProduct, NfcNormalize, RollingHash, SortedCeilSnap, SortedIntersectCount, StrideBytes}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's native expressions: register on an existing
  * session (`GraftFunctions.register(spark)`) or install at build time
  * via `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.GraftExtensions` — after which
  * `graft_dot(a, b)` and `graft_sorted_intersect_count(x, y)` are
  * callable from plain SQL. */
object GraftFunctions {

  /** Expressions with a static Int parameter take it as an INTEGER
    * literal from SQL (it shapes the expression itself, so it cannot
    * be a runtime column). */
  private def intArg(e: Expression, fn: String, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $name must be an INTEGER literal, got $e")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => DotProduct(args(0), args(1))),
    "graft_sorted_intersect_count" ->
      (args => SortedIntersectCount(args(0), args(1))),
    "graft_rolling_hash" -> (args =>
      RollingHash(args(0), intArg(args(1), "graft_rolling_hash", "window"))),
    "graft_stride_bytes" -> (args =>
      StrideBytes(args(0), intArg(args(1), "graft_stride_bytes", "factor"))),
    "graft_nfc" -> (args => NfcNormalize(args(0))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
}

/** Session-extension installer for the same functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), b))
    }
}
