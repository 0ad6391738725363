package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query bench: `runMain graft.QBench <name> [reps]` — runs
  * one catalog query `reps` times on SPARK_GRAFT_SF_DIR and prints each
  * wall time plus the min (best-of-N is the least-biased estimate under
  * single-box CPU-steal noise; see BENCH.md).
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    println(f"""{"query":"$name","times":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${times.min}%.3f}""")
    spark.stop()
  }
}
