package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.Robots
import graft.probes.{CrawlConfig, ForwardingProbeService, Probes}
import graft.universe.Universe

/** robots.txt parsing/matching (RFC 9309 subset) and the opt-in
  * enforcement gate in the web probe path.
  */
class RobotsSpec extends AnyFunSuite {

  private val body =
    """# example policy
      |User-agent: graft-crawler
      |Disallow: /private/
      |Allow: /private/ok.html
      |Disallow: /*.pdf$
      |Crawl-delay: 2.5
      |
      |User-agent: greedybot
      |User-agent: otherbot
      |Disallow: /
      |
      |User-agent: *
      |Disallow: /admin
      |Sitemap: https://example.cz/sitemap.xml
      |""".stripMargin

  private val p = Robots.parse(body)

  test("group selection: specific agent, shared groups, * fallback") {
    assert(p.groupFor("graft-crawler/1.0").exists(_.agents == Seq("graft-crawler")))
    assert(p.groupFor("GreedyBot").exists(_.agents == Seq("greedybot", "otherbot")))
    assert(p.groupFor("randombot").exists(_.agents == Seq("*")))
  }

  test("longest-match precedence; allow wins specific-over-general") {
    assert(!p.allows("graft-crawler", "/private/secret.html"))
    assert(p.allows("graft-crawler", "/private/ok.html")) // longer allow wins
    assert(p.allows("graft-crawler", "/public/page.html"))
  }

  test("wildcards and end anchor") {
    assert(!p.allows("graft-crawler", "/docs/file.pdf"))   // /*.pdf$
    assert(p.allows("graft-crawler", "/docs/file.pdf.html")) // $ anchors
    assert(!p.allows("greedybot", "/anything"))            // Disallow: /
    assert(!p.allows("randombot", "/admin/panel"))         // * group prefix
    assert(p.allows("randombot", "/blog"))
  }

  test("crawl-delay per group; absent elsewhere") {
    assert(p.crawlDelay("graft-crawler").contains(2.5))
    assert(p.crawlDelay("randombot").isEmpty)
  }

  test("empty disallow, junk bodies, and malformed lines stay permissive") {
    val empty = Robots.parse("User-agent: *\nDisallow:\n")
    assert(empty.allows("anybot", "/anything"))
    val html = Robots.parse("<html><body>404 not found</body></html>")
    assert(html.allows("anybot", "/x"))
    assert(Robots.parse("").allows("anybot", "/x"))
    val junk = Robots.parse("User-agent: *\nDisallow /oops-no-colon\nDisallow: /real\n")
    assert(!junk.allows("anybot", "/real/x") && junk.allows("anybot", "/oops-no-colon"))
  }

  test("pattern matcher corner cases") {
    import Robots.patternMatches
    assert(patternMatches("/a/*/c", "/a/b/c"))
    assert(patternMatches("/a/*/c", "/a/b/cd")) // unanchored
    assert(!patternMatches("/a/*/c$", "/a/b/cd"))
    assert(patternMatches("/a*", "/a"))
    assert(!patternMatches("/b", "/a/b"))
  }

  test("probe path enforces robots only when respectRobots is on") {
    val u = new Universe(7L)
    // serve a real policy at /robots.txt; everything else is the universe
    val robotsTxt = "User-agent: *\nDisallow: /\nAllow: /$\n"
    val svc = new ForwardingProbeService(u) {
      override def webStep(host: String, ip: String, port: Int, hop: Int,
          path: String, wantBody: Boolean) =
        if (path == "/robots.txt")
          (200, None, Vector("content-type" -> "text/plain"), Some(robotsTxt), false)
        else inner.webStep(host, ip, port, hop, path, wantBody)
    }
    val d = "nic.cz"
    val off = new Probes(svc, CrawlConfig(webPaths = Seq("/secret.html")))
    val wOff = off.getWeb(d, off.getDnsLocal(d))
    assert(wOff.WEB4_80.get.head.steps.get.head.error.isEmpty) // no gating

    val on = new Probes(svc, CrawlConfig(respectRobots = true,
      webPaths = Seq("/secret.html")))
    val dl = on.getDnsLocal(d)
    // "/" is explicitly allowed (Allow: /$ beats Disallow: / by length)
    val root = on.getWeb(d, dl)
    assert(root.WEB4_80.get.head.steps.get.head.error.isEmpty)
    // any other path is disallowed → observable blocked result
    val paths = on.getWebPaths(d, dl).get
    val blocked = paths.find(_.path == "/secret.html").get.web.WEB4_80.get.head
    assert(blocked.steps.get.head.error.contains("blocked by robots.txt"))
    assert(blocked.steps.get.head.status.isEmpty)
    // determinism: same config, same results
    val on2 = new Probes(svc, CrawlConfig(respectRobots = true,
      webPaths = Seq("/secret.html")))
    assert(on2.getWebPaths(d, on2.getDnsLocal(d)).get == paths)
  }
}
