package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine
import graft.universe.Universe

/** Phase-level timing diagnostics for the crawl path (dev tool). */
object DiagBench {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = args.lift(1).map(_.toLong).getOrElse(400000L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val u = new Universe(42L)
    val eng = new Engine(spark, u,
      workDir = graft.TmpDirs.create("diag").toString)

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val taskSum = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val taskCnt = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val ms = te.taskInfo.duration
        taskMax.merge(te.stageId, ms, Math.max(_, _))
        taskSum.merge(te.stageId, ms, _ + _)
        taskCnt.merge(te.stageId, 1, _ + _)
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val s = sc.stageInfo
        val id = s.stageId
        val wall = (for { a <- s.completionTime; b <- s.submissionTime } yield a - b).getOrElse(-1L)
        if (wall > 300)
          println(f"[stage] id=$id name=${s.name.takeWhile(_ != '\n').take(60)} tasks=${taskCnt.getOrDefault(id, 0)} wall=${wall}ms sumTask=${taskSum.getOrDefault(id, 0L)}ms maxTask=${taskMax.getOrDefault(id, 0L)}ms")
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup whole path at small n
    eng.crawlDomains(spark.range(2000).map(i => u.seedDomain(i))).count()

    val seeds = spark.range(n).map(i => u.seedDomain(i))
      .toDF("domain")
      .withColumn("seq", org.apache.spark.sql.functions.monotonically_increasing_id())
      .as[(String, Long)]
    time("seed gen only") { seeds.count() }
    val entries = time("toFrontier (canon+dedup)") {
      val e = eng.toFrontier(seeds).cache(); e.count(); e
    }
    val results = time("crawlEntries (salt+probes)") {
      eng.crawlEntries(entries).count()
    }
    time("full crawlDomains end-to-end") {
      eng.crawlDomains(spark.range(n).map(i => u.seedDomain(i))).count()
    }
    println(s"[diag] results=$results")
    spark.stop()
  }
}
