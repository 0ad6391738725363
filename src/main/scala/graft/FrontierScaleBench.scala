package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine
import graft.universe.Universe

/** Frontier-structure scale bench: canonicalize→punycode→xxhash64 →
  * first-enqueue dedup → partitioned cuckoo-filter admission (the REAL
  * `Engine.toFrontier` + `Engine.admitUnseen`, including the executor-side
  * filter snapshot writes), at 10^7–10^8 keys on this box.
  *
  * This is the direct evidence for the 10^10-entry design math in BENCH.md:
  * per-partition filter bytes stay ~2.4 B/key at the measured load, raw
  * keys never reach the driver, and admission throughput is shuffle-bound
  * (short FrontierEntry rows), not state-bound.
  *
  * Usage: `sbt "runMain graft.FrontierScaleBench [cores] [nKeys] [partitions]"`
  */
object FrontierScaleBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val p = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-frontier-scale")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val u = new Universe(42L)
    val dir = graft.TmpDirs.create("frontier-scale").toString
    // capacity sized to the key count (95% cuckoo load bound)
    val cap = math.max(1L << 20, (n / p) * 2)
    val eng = new Engine(spark, u, workDir = dir,
      frontierPartitions = p, filterCapacityPerPartition = cap)

    def leg(): (Double, Long) = {
      val seeds = spark.range(n).map(i => (u.seedDomain(i), i.longValue))
      val t0 = System.nanoTime()
      val admitted = eng.admitUnseen(eng.toFrontier(seeds), round = 0).count()
      ((System.nanoTime() - t0) / 1e9, admitted)
    }
    leg() // warm-up (C2 + shuffle services)
    val (dt, admitted) = leg()
    // the warm-up leg must not contaminate the measured leg: its snapshots
    // are never committed to the checkpoint table, so the measured leg
    // re-admits the full key set; fail loudly if that invariant breaks
    // (admitted == 0 would also put Infinity — invalid JSON — below)
    require(admitted > 0,
      s"measured leg admitted 0 of $n keys — warm-up leg contaminated the seen-set")

    val filterBytes = {
      val d = new java.io.File(s"$dir/filters")
      def sz(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(sz).sum).getOrElse(0L)
      sz(d)
    }
    println(f"""{"metric":"frontier_admission","keys":$n,"admitted":$admitted,"sec":$dt%.2f,"keys_per_sec":${n / dt}%.0f,"partitions":$p,"filter_bytes_total":$filterBytes,"filter_bytes_per_partition":${filterBytes / p},"bytes_per_admitted_key":${filterBytes.toDouble / admitted}%.2f,"cores":$cores}""")
    spark.stop()
  }
}
