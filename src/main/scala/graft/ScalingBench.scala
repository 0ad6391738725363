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
    // full-size warm-up: the probe path needs ~10^5 invocations before C2
    // fully compiles it, so a small warmup leaves the first measured run
    // part-interpreted. Measure the steady-state (second) run.
    Bench.crawlBench(spark, nDomains)
    val r = Bench.crawlBench(spark, nDomains)
    spark.stop()
    r
  }

  /** args: [N] [domains] [mode]; mode `both` (default) runs N then 4N in
    * one JVM, `single` runs only `local[N]` and prints one sample — use two
    * `single` invocations (fresh JVM each) for GC-fair comparisons.
    */
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val domains = args.lift(1).map(_.toInt).getOrElse(2000000)
    val mode = args.lift(2).getOrElse("both")
    if (mode == "single") {
      val (t, c) = runAt(n, domains)
      println(f"""{"metric":"throughput","cores":$n,"domains_per_sec":${c / t}%.1f,"domains":$domains,"sec":$t%.2f}""")
    } else {
      // interleaved repeats, min per config: single-box timings are noisy
      // (CPU steal, turbo, GC phase); min is the least-biased estimate of
      // the jobs' intrinsic cost at each parallelism
      val reps = 2
      var bestN, best4N = Double.MaxValue
      var cN, c4N = 0L
      (1 to reps).foreach { _ =>
        val (tn, cn) = runAt(n, domains)
        if (tn < bestN) { bestN = tn; cN = cn }
        val (t4, c4) = runAt(4 * n, domains)
        if (t4 < best4N) { best4N = t4; c4N = c4 }
      }
      val thrN = cN / bestN
      val thr4N = c4N / best4N
      val eff = (thr4N / thrN) / 4.0
      println(
        f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cores":$n,"throughput_n":$thrN%.1f,"4n_cores":${4 * n},"throughput_4n":$thr4N%.1f,"domains":$domains,"sec_n":$bestN%.2f,"sec_4n":$best4N%.2f,"reps":$reps}""")
    }
  }
}
