package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling driver for the fit loop: runs q_fit_tree (or
  * q_fit_deep with arg "deep") twice (warmup + steady state) with
  * per-level timing enabled. */
object ProfileFit {
  def main(args: Array[String]): Unit = {
    val deep = args.contains("deep")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.fit.profile") = "1"
    for (pass <- Seq("warmup", "timed")) {
      val t0 = System.nanoTime()
      val n =
        (if (deep) graft.queries.C45Queries.qFitDeep(spark, sfDir)
         else graft.queries.C45Queries.qFitTree(spark, sfDir)).count()
      println(f"[fit] $pass pass: rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
