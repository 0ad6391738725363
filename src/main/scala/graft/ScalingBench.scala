package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling evidence (BASELINE.json north rule: ≥0.8
  * throughput scaling efficiency between N and 4N executors). No real
  * cluster exists in this sandbox, so the same crawl job runs at
  * `local[N]` and `local[4N]` on identical input; efficiency =
  * (T_4N / T_N) / 4 where T is domains/sec.
  *
  * Usage: `sbt "runMain graft.ScalingBench [N] [domains]"` (default 8, 20000).
  */
object ScalingBench {

  private def runAt(cores: Int, nDomains: Int): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warm-up pass so JIT/classloading don't pollute the 1st sample
    Bench.crawlBench(spark, 500)
    val r = Bench.crawlBench(spark, nDomains)
    spark.stop()
    r
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val domains = args.lift(1).map(_.toInt).getOrElse(20000)
    val (tN, cN) = runAt(n, domains)
    val (t4N, c4N) = runAt(4 * n, domains)
    val thrN = cN / tN
    val thr4N = c4N / t4N
    val eff = (thr4N / thrN) / 4.0
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cores":$n,"throughput_n":$thrN%.1f,"4n_cores":${4 * n},"throughput_4n":$thr4N%.1f,"domains":$domains,"sec_n":$tN%.2f,"sec_4n":$t4N%.2f}""")
  }
}
