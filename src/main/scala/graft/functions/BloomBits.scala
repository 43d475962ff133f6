package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers over Spark's native bloom-filter expressions — the
  * same `BloomFilterAggregate` / `BloomFilterMightContain` pair the
  * optimizer's runtime-filter injection uses, exposed for explicit
  * blocklist prefiltering ([[graft.operators.Blocklist]]). Both sides
  * are codegen'd Catalyst expressions (the membership probe inlines an
  * xxhash64 + bit-test into whole-stage codegen); no UDF, no
  * serialization of the filter per row. Bloom construction is bitwise
  * OR-merge of partial filters, so the built bits are identical under
  * any partitioning. */
object BloomBits {

  /** Aggregate: build a bloom filter binary of `key` values sized for
    * `expectedItems` (Spark's default ~3% fpp at that cardinality).
    * Null keys are skipped (never members). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))), expectedItems)
      .toAggregateExpression())

  /** Membership probe against driver-collected bloom bits. The bits
    * ride the plan as a Literal (task-binary broadcast); `null` key →
    * `null`, matching SQL comparison semantics. */
  def mightContain(bloomBits: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBits),
      new XxHash64(Seq(ColumnBridge.expression(key)))))
}
