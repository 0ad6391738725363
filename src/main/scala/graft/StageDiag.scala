package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization tooling: run one catalog query `reps` times with a
  * stage-level listener (per-stage wall, task-time sum, max task) so the
  * time sink inside a slow query is visible without the UI (guide §7.1's
  * stage view, headless). Usage:
  *
  *   runMain graft.StageDiag <query> [reps]
  */
object StageDiag {
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
    @volatile var show = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val sum = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val max = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      private val cnt = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val ms = te.taskInfo.duration
        sum.merge(te.stageId, ms, _ + _)
        max.merge(te.stageId, ms, Math.max(_, _))
        cnt.merge(te.stageId, 1, _ + _)
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val s = sc.stageInfo
        val wall = (for { a <- s.completionTime; b <- s.submissionTime } yield a - b).getOrElse(-1L)
        if (show && wall >= 20) {
          val rdds = s.rddInfos.map(r => s"${r.id}:${r.name}").mkString(",")
          println(f"[stage] id=${s.stageId} tasks=${cnt.getOrDefault(s.stageId, 0)} wall=${wall}ms sumTask=${sum.getOrDefault(s.stageId, 0L)}ms maxTask=${max.getOrDefault(s.stageId, 0L)}ms rdds=[${rdds.take(500)}]")
        }
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      show = i == reps // only narrate the LAST (warm) rep
      val t0 = System.nanoTime()
      // post-run: every codegen span's duration + its operator stack —
      // the headless stand-in for the SQL tab's per-operator metrics;
      // captured via a QueryExecutionListener so the WRITE's execution
      // (the one that actually ran) is the one walked
      val ql = new org.apache.spark.sql.util.QueryExecutionListener {
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
          p match {
            case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
              val ms = w.metrics.get("pipelineTime").map(_.value).getOrElse(-1L)
              val ops = w.collect { case n => n.nodeName }.take(8).mkString(" <- ")
              if (ms >= 100) println(f"[wscg] ${ms}ms $ops")
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan)
            case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              walk(i.relation.cachedPlan)
            case _ =>
          }
          p.children.foreach(walk)
        }
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
          walk(qe.executedPlan)
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      }
      if (show) spark.listenerManager.register(ql)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the QueryExecutionListener drain
      if (show) spark.listenerManager.unregister(ql)
      spark.catalog.clearCache()
      println(f"[diag] $name rep $i: $dt%.3f s")
    }
    spark.stop()
  }
}
