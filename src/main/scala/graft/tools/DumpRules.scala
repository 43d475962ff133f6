package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a fitted rule set (for the golden-fit specs).
  * args: [sfDir] [fitQuery] — fitQuery is "tree" (default) or "deep". */
object DumpRules {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val fit = if (args.length > 1 && args(1) == "deep")
      graft.queries.C45Queries.qFitDeep _
    else if (args.length > 1 && args(1) == "pruned")
      graft.queries.C45Queries.qFitPruned _
    else if (args.length > 1 && args(1) == "simplify")
      graft.queries.C45Queries.qRuleSimplify _
    else if (args.length > 1 && args(1) == "missing")
      graft.queries.C45Queries.qFitMissing _
    else graft.queries.C45Queries.qFitTree _
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1 && args(1) == "crossval")
      graft.queries.C45Queries.qCrossVal(spark, sfDir).collect()
        .foreach(r => println("CV|" + r.getInt(0) + "," + r.getLong(1) + "," + r.getLong(2)))
    else if (args.length > 1 && args(1) == "crossval_missing")
      graft.queries.C45Queries.qCrossValMissing(spark, sfDir).collect()
        .foreach(r => println("CV|" + r.getInt(0) + "," + r.getLong(1) + "," + r.getLong(2)))
    else if (args.length > 1 && args(1) == "importance")
      graft.queries.C45Queries.qFeatureImportance(spark, sfDir).collect()
        .foreach(r => println("IMP|" + r.getString(0) + "," + r.getLong(1)))
    else if (args.length > 1 && args(1) == "proba")
      graft.queries.C45Queries.qPredictProba(spark, sfDir).collect()
        .foreach(r => println("PROB|" + r.getString(0) + "," + r.getLong(1) +
          "," + r.getLong(2) + "," + r.getLong(3)))
    else if (args.length > 1 && args(1) == "simplify_proba")
      graft.queries.C45Queries.qSimplifyProba(spark, sfDir).collect()
        .foreach(r => println("PROB|" + r.getString(0) + "," + r.getLong(1) +
          "," + r.getLong(2) + "," + r.getLong(3)))
    else fit(spark, sfDir).collect()
      .foreach(r => println("RULE|" + r.getString(0) + "|" + r.getString(1) + "|" + r.getInt(2)))
    spark.stop()
  }
}
