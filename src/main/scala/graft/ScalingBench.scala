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

  case class Leg(wallSec: Double, crawled: Long, gcSec: Double, taskCoreSec: Double)

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  private def runAt(cores: Int, nDomains: Int): Leg = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        taskMs.addAndGet(te.taskInfo.duration)
    })
    // full-size warm-up: the probe path needs ~10^6 invocations before C2
    // fully compiles it (measured: core-seconds drop 2.4× between the first
    // and second full-scale run). Measure the steady-state (second) run.
    Bench.crawlBench(spark, nDomains)
    taskMs.set(0L)
    val gc0 = gcMillis
    val (dt, n) = Bench.crawlBench(spark, nDomains)
    val leg = Leg(dt, n, (gcMillis - gc0) / 1e3, taskMs.get() / 1e3)
    spark.stop()
    leg
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
      val l = runAt(n, domains)
      println(f"""{"metric":"throughput","cores":$n,"domains_per_sec":${l.crawled / l.wallSec}%.1f,"domains":$domains,"sec":${l.wallSec}%.2f,"gc_sec":${l.gcSec}%.2f,"task_core_sec":${l.taskCoreSec}%.1f}""")
    } else {
      // interleaved repeats, min per config: single-box timings are noisy
      // (CPU steal, turbo, GC phase); min is the least-biased estimate of
      // the jobs' intrinsic cost at each parallelism
      val reps = 2
      var bestN: Leg = null
      var best4N: Leg = null
      (1 to reps).foreach { _ =>
        val ln = runAt(n, domains)
        if (bestN == null || ln.wallSec < bestN.wallSec) bestN = ln
        val l4 = runAt(4 * n, domains)
        if (best4N == null || l4.wallSec < best4N.wallSec) best4N = l4
      }
      val thrN = bestN.crawled / bestN.wallSec
      val thr4N = best4N.crawled / best4N.wallSec
      val eff = (thr4N / thrN) / 4.0
      // core-seconds inflation: how much more total CPU the same job takes
      // at 4N threads (memory-bandwidth / GC pressure); 1.0 = perfect
      val inflation = best4N.taskCoreSec / bestN.taskCoreSec
      println(
        f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_cores":$n,"throughput_n":$thrN%.1f,"4n_cores":${4 * n},"throughput_4n":$thr4N%.1f,"domains":$domains,"sec_n":${bestN.wallSec}%.2f,"sec_4n":${best4N.wallSec}%.2f,"core_sec_n":${bestN.taskCoreSec}%.1f,"core_sec_4n":${best4N.taskCoreSec}%.1f,"core_sec_inflation":$inflation%.3f,"gc_sec_n":${bestN.gcSec}%.2f,"gc_sec_4n":${best4N.gcSec}%.2f,"reps":$reps}""")
    }
  }
}
