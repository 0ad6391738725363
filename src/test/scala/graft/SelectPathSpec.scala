package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, to_json, xxhash64}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model.Model._
import graft.probes.ForwardingProbeService
import graft.universe.Universe

/** Per-probe call counter through the ProbeService seam. `dnssecState` is
  * called exactly once per `getDnsLocal`, i.e. once per crawled domain per
  * pipeline pass — the cleanest observable for how many times the engine
  * re-executes the probe pipeline. Local-mode executors share the JVM, so
  * a companion-object map sees every task's calls.
  */
class CountingProbeService(u: Universe, id: String, det: Boolean)
    extends ForwardingProbeService(u) {
  override def deterministic: Boolean = det
  override def dnssecState(domain: String): String = {
    CountingProbeService.bump(id, domain)
    super.dnssecState(domain)
  }
}

object CountingProbeService {
  val calls = new ConcurrentHashMap[(String, String), AtomicLong]()
  def bump(id: String, domain: String): Unit =
    calls.computeIfAbsent((id, domain), _ => new AtomicLong()).incrementAndGet()
  def countsFor(id: String): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    calls.forEach { (k, v) => if (k._1 == id) b += k._2 -> v.get() }
    b.result()
  }
}

class SelectPathSpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private val u = new Universe(42L)
  private val contentCfg = graft.probes.CrawlConfig(saveContent = true)

  private def seedDocs(nDomains: Int): Dataset[Doc] = {
    val docs = (0 until nDomains).grouped(5).zipWithIndex.map {
      case (idxs, d) =>
        val spans = idxs.zipWithIndex.map { case (i, off) =>
          Span("text", u.seedDomain(i.toLong), null, off)
        }
        Doc(f"doc-$d%06d", spans)
    }
    spark.createDataset(docs.toSeq)
  }

  /** Full results-table digest: identity, pop order, and a hash of the
    * entire nested result tree.
    */
  private def digest(eng: Engine): Seq[(String, Int, Long, Long)] =
    eng.resultsTable.read().get
      .select(col("domain"), col("pop_round"), col("pop_rank"),
        xxhash64(to_json(col("result"))).as("h"))
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq

  test("distributed selection fallback (guards forced to 0) is bit-identical to the driver path, discovery on") {
    val svc = new LinkPlantingService(u)
    def run(forceFallback: Boolean): (Seq[(String, Int, Long, Long)], Seq[Engine.RoundStats]) = {
      val dir = graft.TmpDirs.create("selpath").toString
      val eng = new Engine(spark, u, cfg = contentCfg, workDir = dir,
        frontierPartitions = 8, probeService = svc,
        discovery = Engine.DiscoveryConfig.on.copy(maxDepth = 1),
        maxDriverBuckets = if (forceFallback) 0 else 100000,
        maxDriverSelectRows = if (forceFallback) 0L else 5000000L)
      val stats = eng.run(seedDocs(60))
      (digest(eng), stats)
    }
    val (driverRes, driverStats) = run(forceFallback = false)
    val (fallbackRes, fallbackStats) = run(forceFallback = true)
    assert(fallbackRes == driverRes)
    assert(driverRes.nonEmpty)
    // round accounting must agree too: crawled/deferred/discovered per round
    assert(fallbackStats.map(s => (s.round, s.admitted, s.crawled, s.deferred, s.discovered))
      == driverStats.map(s => (s.round, s.admitted, s.crawled, s.deferred, s.discovered)))
    // the run actually exercised multi-round deferral + discovery
    assert(driverStats.exists(_.discovered > 0))
  }

  test("fallback resume: interrupt after round 1 under forced fallback, resume — identical to uninterrupted fallback run") {
    val svc = new LinkPlantingService(u)
    def mk(dir: String) = new Engine(spark, u, cfg = contentCfg, workDir = dir,
      frontierPartitions = 8, probeService = svc,
      discovery = Engine.DiscoveryConfig.on.copy(maxDepth = 1),
      maxDriverBuckets = 0, maxDriverSelectRows = 0L)
    val dirFull = graft.TmpDirs.create("selpath-full").toString
    val engFull = mk(dirFull)
    engFull.run(seedDocs(40))
    val dirRes = graft.TmpDirs.create("selpath-res").toString
    mk(dirRes).run(seedDocs(40), maxRounds = 1)
    val engRes = mk(dirRes)
    engRes.run(seedDocs(40))
    assert(digest(engRes) == digest(engFull))
  }

  test("non-deterministic probe service: each domain is probed exactly once per round (results persisted, passes share them)") {
    val id = "nondet-" + System.nanoTime()
    val svc = new CountingProbeService(u, id, det = false)
    val dir = graft.TmpDirs.create("selpath-nondet").toString
    val eng = new Engine(spark, u, cfg = contentCfg, workDir = dir,
      frontierPartitions = 8, probeService = svc,
      discovery = Engine.DiscoveryConfig.on.copy(maxDepth = 1))
    eng.run(seedDocs(40))
    val counts = CountingProbeService.countsFor(id)
    val crawled = eng.resultsTable.read().get.select("domain").as[String].collect().toSet
    assert(counts.keySet == crawled)
    val multi = counts.filter(_._2 != 1L)
    assert(multi.isEmpty,
      s"domains probed more than once per round under a non-deterministic service: $multi")
  }

  test("deterministic probe service (the default): passes re-execute the cheap probes instead of caching wide rows") {
    val id = "det-" + System.nanoTime()
    val svc = new CountingProbeService(u, id, det = true)
    val dir = graft.TmpDirs.create("selpath-det").toString
    val eng = new Engine(spark, u, cfg = contentCfg, workDir = dir,
      frontierPartitions = 8, probeService = svc,
      discovery = Engine.DiscoveryConfig.on.copy(maxDepth = 1))
    eng.run(seedDocs(40))
    val counts = CountingProbeService.countsFor(id)
    // results + spans (+ discovery) passes each re-probe: >1 per domain
    assert(counts.values.exists(_ > 1L),
      "expected multi-pass probe re-execution under the deterministic contract")
  }
}
