package graft

import graft.probes.{CrawlConfig, Probes}
import graft.universe.Universe

/** Single-thread probe-path microbenchmark (dev tool): ns/domain and
  * allocated bytes/domain for `Probes.processDomain`, the term that drives
  * the 8→32 memory-bandwidth ceiling (BENCH.md). Run:
  * `sbt "runMain graft.AllocBench [nDomains]"`.
  */
object AllocBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val u = new Universe(42L)
    val p = new Probes(u, CrawlConfig())
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId

    def leg(label: String, count: Int): Unit = {
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      var i = 0
      var sink = 0
      while (i < count) {
        val r = p.processDomain(u.seedDomain(i.toLong % 1000000), "2026-01-01 00:00:00")
        sink ^= r.domain.length
        i += 1
      }
      val dt = System.nanoTime() - t0
      val da = tmx.getThreadAllocatedBytes(tid) - a0
      println(f"[alloc] $label n=$count ns/domain=${dt.toDouble / count}%.0f " +
        f"bytes/domain=${da.toDouble / count}%.0f (sink=$sink)")
    }

    leg("warmup-1", n) // C2 warm-up
    leg("warmup-2", n)
    leg("steady-1", n)
    leg("steady-2", n)

    // per-phase breakdown (each includes its own getDnsLocal dependency
    // where the real pipeline shares one — subtract dns to decompose)
    def phase(label: String, count: Int)(f: String => Any): Unit = {
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      var i = 0
      while (i < count) { f(u.seedDomain(i.toLong % 1000000)); i += 1 }
      val dt = System.nanoTime() - t0
      val da = tmx.getThreadAllocatedBytes(tid) - a0
      println(f"[alloc] $label n=$count ns=${dt.toDouble / count}%.0f " +
        f"bytes=${da.toDouble / count}%.0f")
    }
    val m = n / 2
    phase("dns_local", m)(d => p.getDnsLocal(d))
    phase("dns_auth", m)(d => p.getDnsAuth(d))
    val dlCache = new java.util.HashMap[String, graft.model.Model.DnsLocal]()
    def dl(d: String) = { var v = dlCache.get(d); if (v == null) { v = p.getDnsLocal(d); if (dlCache.size < 1100000) dlCache.put(d, v) }; v }
    phase("warm-dl", m)(d => dl(d))
    phase("mail(+dl cached)", m)(d => p.getMail(d, dl(d)))
    phase("web(+dl cached)", m)(d => p.getWeb(d, dl(d)))
    phase("web_paths(+dl cached)", m)(d => p.getWebPaths(d, dl(d)))
  }
}
