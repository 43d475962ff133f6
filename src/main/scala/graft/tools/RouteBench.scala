package graft.tools

import graft.fit.{C45, C45Params}
import graft.meta.C45Schema
import org.apache.spark.sql.SparkSession

/** Measures the deep-frontier routing modes against each other on a
  * synthetic wide tree (three 8-value categorical attributes + one
  * numeric, frontiers growing 8 → 64 → 512): flat CASE WHEN routing vs the
  * broadcast rule-table join above `routeJoinThreshold`. Prints
  * wall-clock per mode and asserts the rule sets match.
  *
  * Usage: sbt "runMain graft.tools.RouteBench [rowsPerCell]"
  */
object RouteBench {
  def main(args: Array[String]): Unit = {
    val perCell = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-route-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Greedy-growable signal at EVERY level (a parity/XOR target would
    // close at the root): class = [c < f(a,b)] with f cycling 1..7, so
    // every attribute carries marginal gain, every (a,b) node still
    // splits on c, and the tree must isolate all 512 (a,b,c) cells —
    // frontiers grow 8 -> 64 -> 512 in whichever order greedy picks.
    // `x` is numeric noise (keeps the numeric stat path in the loop).
    val rows = for {
      a <- 0 until 8; b <- 0 until 8; c <- 0 until 8
      x <- 0 until 4; copy <- 0 until perCell
    } yield {
      val cls = if (c < (a * 8 + b) % 7 + 1) "p" else "n"
      (s"a$a", s"b$b", s"c$c", x.toDouble, cls, copy)
    }
    val df = rows.toDF("a", "b", "c", "x", "cls", "copy").drop("copy")
      .repartition(32).cache()
    df.count()
    val schema = C45Schema.fromDataFrame(df, "cls")

    def time(label: String, p: C45Params): (Double, Set[String]) = {
      val t0 = System.nanoTime()
      val m = C45.fit(df, schema, p)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: $sec%.1fs, ${m.leaves.size} leaves")
      (sec, m.leaves.map(_.encode).toSet)
    }
    // warmup (JIT + codegen caches) on a depth-bounded tree
    time("warmup (flat)", C45Params(routeJoinThreshold = Int.MaxValue, maxDepth = 1))
    val (tFlat, flat) = time("flat CASE WHEN", C45Params(routeJoinThreshold = Int.MaxValue))
    val (tJoin, joined) = time("broadcast-join routing", C45Params(routeJoinThreshold = 8))
    require(flat == joined, "rule sets must match between modes")
    println(f"speedup at deep frontier: ${tFlat / tJoin}%.2fx")
    spark.stop()
  }
}
