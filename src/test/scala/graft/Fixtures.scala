package graft

import graft.meta.{AttrMeta, C45Schema}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical 14-row play-tennis dataset (FIXTURES.md §1): categorical
  * outlook/windy, numeric temperature/humidity, class play ∈ {yes,no}. */
object Fixtures {
  val tennisSchema: C45Schema = C45Schema(
    Seq(AttrMeta("outlook", isNumeric = false, Seq("sunny", "overcast", "rainy")),
      AttrMeta("temperature", isNumeric = true),
      AttrMeta("humidity", isNumeric = true),
      AttrMeta("windy", isNumeric = false, Seq("true", "false"))),
    "play", Seq("no", "yes"))

  val tennisRows: Seq[(String, Double, Double, String, String)] = Seq(
    ("sunny", 85.0, 85.0, "false", "no"),
    ("sunny", 80.0, 90.0, "true", "no"),
    ("overcast", 83.0, 86.0, "false", "yes"),
    ("rainy", 70.0, 96.0, "false", "yes"),
    ("rainy", 68.0, 80.0, "false", "yes"),
    ("rainy", 65.0, 70.0, "true", "no"),
    ("overcast", 64.0, 65.0, "true", "yes"),
    ("sunny", 72.0, 95.0, "false", "no"),
    ("sunny", 69.0, 70.0, "false", "yes"),
    ("rainy", 75.0, 80.0, "false", "yes"),
    ("sunny", 75.0, 70.0, "true", "yes"),
    ("overcast", 72.0, 90.0, "true", "yes"),
    ("overcast", 81.0, 75.0, "false", "yes"),
    ("rainy", 71.0, 91.0, "true", "no"))

  def tennis(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tennisRows.toDF("outlook", "temperature", "humidity", "windy", "play")
  }
}
