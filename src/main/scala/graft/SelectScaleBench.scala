package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine
import graft.universe.Universe

/** Politeness-selection scale bench: driver path vs distributed fallback
  * at high nameserver-bucket cardinality (the round-4 guard,
  * `Engine.maxDriverBuckets`). Evidence target: at ≥10^6 buckets the
  * fallback's driver heap stays FLAT (its only driver-sized results are
  * scalar aggregates and the ≤P-row throughput counters) while the driver
  * path's collected selected-set grows with Σ budgets — the reason the
  * guard exists.
  *
  * Usage: `sbt "runMain graft.SelectScaleBench [cores] [entries]"` —
  * prints one JSON line per (buckets, path) leg.
  */
object SelectScaleBench {

  private def usedHeapMb(): Long = {
    System.gc(); System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = args.lift(1).map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-select-scale")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    for (nBuckets <- Seq(100000, 1000000); driverPath <- Seq(true, false)) {
      // provider universe with `nBuckets` distinct nameserver buckets and
      // a small flat budget, so Σ budgets (= the driver path's collected
      // row bound) scales with bucket cardinality
      val u = new Universe(42L) {
        override def nsProvider(domain: String): Int =
          Math.floorMod(graft.ops.TextOps.hashToken(domain), nBuckets.toLong).toInt
        override def policyBudget(nsBucket: Int): Int = 4
      }
      val dir = graft.TmpDirs.create("select-scale").toString
      val eng = new Engine(spark, u, workDir = dir, frontierPartitions = 64)
      val frontier = eng.toFrontier(
        spark.range(n).map(i => (s"d$i.cz", i.longValue))).cache()
      frontier.count() // materialize input outside the measured window
      val before = usedHeapMb()
      val t0 = System.nanoTime()
      val (selected, heapAfter) =
        if (driverPath) {
          val budgets = frontier.select("nsBucket").distinct().as[Int]
            .collect().map(b => b -> u.policyBudget(b)).toMap
          val (sel, _) = eng.selectUnderBudget(frontier, budgets, 4)
          val rows = sel
            .map(e => (e.canonical, e.nsBucket, e.priority, e.seq, e.key, e.depth))
            .collect() // the driver-path materialization under test
          val h = usedHeapMb()
          (rows.length.toLong, h)
        } else {
          val rs = eng.selectDistributed(frontier)
          // the fallback's only caches are executor-tier storage (spread
          // across executors on a real cluster); in local mode driver and
          // executors share one JVM, so unpersist before measuring the
          // DRIVER-resident state — which is what the guard protects
          rs.release()
          (rs.nSelected, usedHeapMb())
        }
      val dt = (System.nanoTime() - t0) / 1e9
      frontier.unpersist()
      println(f"""{"metric":"select_scale","path":"${if (driverPath) "driver" else "fallback"}","buckets":$nBuckets,"entries":$n,"selected":$selected,"sec":$dt%.2f,"driver_heap_before_mb":$before,"driver_heap_after_mb":$heapAfter,"driver_heap_delta_mb":${heapAfter - before}}""")
    }
    spark.stop()
  }
}
