package graft.frontier

/** robots.txt parsing + matching (RFC 9309 subset) — the "robots" half of
  * the north rule's "token-bucket politeness … plus a robots.txt/zone-
  * transfer-policy cache". The reference crawler does not honor robots
  * (it probes DNS/mail and fetches one page per combo), so enforcement is
  * opt-in (`CrawlConfig.respectRobots`); the parser itself is fully
  * implemented and spec-tested.
  *
  * Supported per RFC 9309: `user-agent` group collection (consecutive UA
  * lines share one group), `allow`/`disallow` rules with `*` wildcards and
  * the `$` end anchor, longest-match precedence with allow winning exact
  * ties, case-insensitive directive names and UA product tokens, `#`
  * comments, and the most-specific-user-agent group selection with `*`
  * fallback. `crawl-delay` (de-facto standard, not in the RFC) is parsed
  * per group for the politeness budget hook. Unparseable bodies (HTML
  * error pages and the like) yield an allow-everything policy, matching
  * the must-be-permissive guidance for malformed files.
  *
  * Why crawl-delay is exposed but NOT folded into the engine's per-round
  * token budgets: this is a crawl-ONCE engine (the seen-set guarantees a
  * host is fetched for exactly one domain, with no revisits), so a
  * per-host inter-request delay has nothing to meter across rounds. The
  * only same-host repeat fetches are a single domain's own path/www/port
  * combos within one probe — which the reference crawler issues without
  * rate-limiting too. A recrawl scheduler built on this engine would read
  * `Policy.crawlDelay` from the same per-(host,port) cache the fetch gate
  * uses.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule],
      crawlDelay: Option[Double])

  final class Policy(val groups: Seq[Group]) extends Serializable {

    /** Most-specific group for the agent (longest matching UA token;
      * `*` only when nothing else matches), per RFC 9309 §2.2.1.
      */
    def groupFor(agent: String): Option[Group] = {
      val a = agent.toLowerCase
      val matches = groups.flatMap { g =>
        g.agents.collect {
          case ua if ua != "*" && a.contains(ua.toLowerCase) => (ua.length, g)
        }
      }
      if (matches.nonEmpty) Some(matches.maxBy(_._1)._2)
      else groups.find(_.agents.exists(_ == "*"))
    }

    /** Is `path` fetchable for `agent`? Longest-match rule wins; an allow
      * beats a disallow of equal specificity; no matching rule (or no
      * applicable group) → allowed.
      */
    def allows(agent: String, path: String): Boolean = groupFor(agent) match {
      case None => true
      case Some(g) =>
        var bestLen = -1
        var bestAllow = true
        g.rules.foreach { r =>
          if (r.pattern.nonEmpty && patternMatches(r.pattern, path)) {
            val len = r.pattern.length
            if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
              bestLen = len
              bestAllow = r.allow
            }
          }
        }
        bestAllow
    }

    /** Crawl-delay seconds for `agent`'s group, if declared — the hook the
      * engine's per-bucket politeness budget can scale by.
      */
    def crawlDelay(agent: String): Option[Double] =
      groupFor(agent).flatMap(_.crawlDelay)
  }

  /** `*`/`$` glob match anchored at the path start (RFC 9309 §2.2.3). */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    // segments between '*' must appear in order; first segment at offset 0
    val segs = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    // with a trailing '*' the last segment is "" and pos ≤ len always;
    // anchored patterns must consume the whole path
    if (anchored && !pat.endsWith("*")) pos == path.length else true
  }

  val allowAll: Policy = new Policy(Seq.empty)

  /** Parse a robots.txt body. Never throws: junk lines are skipped, an
    * empty/alien body (HTML 404 page…) yields [[allowAll]].
    */
  def parse(body: String): Policy = {
    if (body == null) return allowAll
    var groups = Vector.empty[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inRules = false // false while collecting consecutive UA lines

    def flush(): Unit = {
      if (agents.nonEmpty) groups :+= Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
      inRules = false
    }

    body.linesIterator.foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val key = line.substring(0, ci).trim.toLowerCase
          val value = line.substring(ci + 1).trim
          key match {
            case "user-agent" =>
              if (inRules) flush() // a UA after rules starts a new group
              agents :+= value
            case "allow" if agents.nonEmpty =>
              inRules = true; rules :+= Rule(allow = true, value)
            case "disallow" if agents.nonEmpty =>
              inRules = true
              // empty disallow = "allow everything" (no rule)
              if (value.nonEmpty) rules :+= Rule(allow = false, value)
            case "crawl-delay" if agents.nonEmpty =>
              inRules = true
              if (delay.isEmpty) delay = value.toDoubleOption.filter(_ >= 0)
            case _ => () // sitemap / unknown directives: ignored
          }
        }
      }
    }
    flush()
    new Policy(groups)
  }
}
