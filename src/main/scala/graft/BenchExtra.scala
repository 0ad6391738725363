package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization tooling (guide §1.4): time named queries with the
  * NOOP sink — which computes every column of every row and discards it —
  * instead of Bench's `count()`, isolating the computation from both the
  * sink and count-only column pruning. Prints one JSON line with per-query
  * min/median over `reps`. Jobs are labelled (guide §1.5). This main is
  * ADDITIVE: graft.Bench stays the frozen driver contract.
  *
  *   runMain graft.BenchExtra [reps] [query ...]    # default: headline set
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
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
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name noop rep $i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.sorted
      spark.sparkContext.setJobDescription(null)
      name -> (times.head, times(times.size / 2))
    }
    val qs = results.map { case (k, (mn, md)) =>
      f""""$k":{"min":$mn%.3f,"median":$md%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"noop","unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
