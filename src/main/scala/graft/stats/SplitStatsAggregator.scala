package graft.stats

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Output of the one-pass split-statistics aggregation. */
case class SplitStats(n: Long, info: Double, splitInfo: Double,
                      condEntropy: Double, gain: Double, gainRatio: Double)

/** Typed single-pass alternative to [[InfoStats.categoricalSplitStats]]
  * (the optional `Aggregator[IN, ContingencyBuf, SplitStats]` of
  * SURVEY.md §4): consumes raw (attrValue, classLabel) pairs, carries
  * the contingency table as its buffer — so the shuffle moves one
  * partially-merged table per partition, never raw rows — and emits all
  * four statistics (Info/SplitInfo/CondEntropy/GainRatio, reference
  * formulas MyReducer.java:243-298 incl. the ε special cases) in
  * `finish`. Buffer size is bounded by |values|×|classes| per group.
  *
  * Use via `ds.groupByKey(...).agg(new SplitStatsAggregator().toColumn)`.
  * The declarative [[InfoStats.categoricalSplitStats]] remains the
  * default (codegen'd, no kryo buffers); this is the UDAF surface for
  * consumers who need single-expression aggregation. */
class SplitStatsAggregator
  extends Aggregator[(String, String), Map[(String, String), Long], SplitStats] {

  override def zero: Map[(String, String), Long] = Map.empty

  override def reduce(b: Map[(String, String), Long],
                      in: (String, String)): Map[(String, String), Long] =
    b.updated(in, b.getOrElse(in, 0L) + 1L)

  override def merge(a: Map[(String, String), Long],
                     b: Map[(String, String), Long]): Map[(String, String), Long] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  override def finish(cells: Map[(String, String), Long]): SplitStats = {
    val tol = 1e-12
    def plogp(c: Double): Double = if (c > 0) c * (math.log(c) / math.log(2)) else 0.0
    val n = cells.values.sum.toDouble
    if (n == 0) return SplitStats(0, 0, 0, 0, 0, 0)
    val log2n = math.log(n) / math.log(2)
    val byVal = cells.groupBy(_._1._1).view.mapValues(_.values.sum.toDouble)
    val byCls = cells.groupBy(_._1._2).view.mapValues(_.values.sum.toDouble)
    val sCell = cells.values.map(c => plogp(c.toDouble)).sum
    val sVal = byVal.values.map(plogp).sum
    val sCls = byCls.values.map(plogp).sum
    val info = log2n - sCls / n
    val splitInfo = log2n - sVal / n
    val condE = (sVal - sCell) / n
    val gain = info - condE
    val gr =
      if (math.abs(splitInfo) < tol)
        (if (math.abs(info) < tol) 0.0 else InfoStats.Epsilon)
      else gain / splitInfo
    SplitStats(n.toLong, info, splitInfo, condE, gain, gr)
  }

  override def bufferEncoder: Encoder[Map[(String, String), Long]] =
    Encoders.kryo[Map[(String, String), Long]]
  override def outputEncoder: Encoder[SplitStats] = Encoders.product[SplitStats]
}
