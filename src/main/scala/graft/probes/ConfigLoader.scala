package graft.probes

/** Reference-compatible config loading (F19/S2; `config_loader.py:84-138`):
  * a hand-rolled YAML-subset parser (no external deps in this sandbox) +
  * the reference's `merge_dicts` defaults-merge with its exact string
  * coercion rules, mapped onto [[CrawlConfig]].
  *
  * Parser coverage — the subset the reference `config.yml` family actually
  * uses: nested maps by 2-space-ish indentation, block lists (`- item`),
  * inline lists (`[a, b]`), scalars (bool/int/float/null/quoted/plain),
  * full-line and trailing `# comments`.
  *
  * Coercion (`merge_dicts`, `config_loader.py:84-103`) for string values:
  *  1. a valid *global* IP address stays a string (the reference's
  *     `is_valid_ip_address` is `ipaddress.*Address(ip).is_global` —
  *     this is why `2001:148f:ffff::1`, which starts with a digit, is not
  *     eaten by the float rule);
  *  2. else, first char a digit → float;
  *  3. `"True"`/`"False"` → bool;
  *  4. else the string.
  *
  * Legacy-format handling (`config_loader.py:113-131`): top-level
  * `http_timeout`/`dns_timeout`/`save_web_content` (pre-v1.2) → warn and
  * use defaults; top-level `resolvers` (pre-v1.4) → converted into
  * `dns.resolvers` (the reference also rewrites the file on disk; we only
  * convert in memory — a config load should not mutate its input).
  */
object ConfigLoader {

  // ----------------------------------------------------------- YAML subset

  sealed trait YVal
  case class YMap(entries: Vector[(String, YVal)]) extends YVal {
    def get(k: String): Option[YVal] = entries.collectFirst { case (`k`, v) => v }
  }
  case class YList(items: Vector[YVal]) extends YVal
  case class YStr(s: String) extends YVal
  case class YNum(d: Double) extends YVal
  case class YBool(b: Boolean) extends YVal
  case object YNull extends YVal

  private def stripComment(line: String): String = {
    // a '#' starts a comment at line start or after whitespace, unless we
    // are inside quotes (good enough for the reference config family)
    var inS = false; var inD = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == '#' && !inS && !inD &&
        (i == 0 || line.charAt(i - 1) == ' ' || line.charAt(i - 1) == '\t'))
        return line.substring(0, i)
      i += 1
    }
    line
  }

  private def scalar(raw: String): YVal = {
    val t = raw.trim
    if (t.isEmpty || t == "null" || t == "~" || t == "Null" || t == "NULL") YNull
    else if (t == "true" || t == "True" || t == "TRUE") YBool(true)
    else if (t == "false" || t == "False" || t == "FALSE") YBool(false)
    else if ((t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) ||
             (t.startsWith("'") && t.endsWith("'") && t.length >= 2))
      YStr(t.substring(1, t.length - 1))
    else if (t.matches("[+-]?\\d+")) YNum(t.toLong.toDouble)
    else if (t.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?")) YNum(t.toDouble)
    else if (t.startsWith("[") && t.endsWith("]")) {
      val body = t.substring(1, t.length - 1).trim
      if (body.isEmpty) YList(Vector.empty)
      else YList(body.split(",").toVector.map(scalar))
    }
    else YStr(t)
  }

  /** Parse the YAML subset; empty / comment-only input → empty map (the
    * reference warns "Didn't find anything" and uses defaults).
    */
  def parseYaml(text: String): YMap = {
    val lines = text.linesIterator.map(stripComment)
      .map(_.replaceAll("\\s+$", ""))
      .filter(_.trim.nonEmpty)
      .toVector
      .map(l => (l.takeWhile(_ == ' ').length, l.trim))

    def parseBlock(start: Int, indent: Int): (YVal, Int) = {
      if (start >= lines.length) return (YMap(Vector.empty), start)
      val (_, first) = lines(start)
      if (first.startsWith("- ") || first == "-") {
        var items = Vector.empty[YVal]
        var i = start
        while (i < lines.length && lines(i)._1 == indent &&
            (lines(i)._2.startsWith("- ") || lines(i)._2 == "-")) {
          val item = lines(i)._2.drop(1).trim
          items :+= scalar(item)
          i += 1
        }
        (YList(items), i)
      } else {
        var entries = Vector.empty[(String, YVal)]
        var i = start
        while (i < lines.length && lines(i)._1 == indent && lines(i)._2.contains(":")) {
          val l = lines(i)._2
          val ci = l.indexOf(':')
          val key = l.substring(0, ci).trim.stripPrefix("\"").stripSuffix("\"")
          val rest = l.substring(ci + 1).trim
          if (rest.nonEmpty) { entries :+= key -> scalar(rest); i += 1 }
          else if (i + 1 < lines.length && lines(i + 1)._1 > indent) {
            val (nested, next) = parseBlock(i + 1, lines(i + 1)._1)
            entries :+= key -> nested
            i = next
          } else { entries :+= key -> YNull; i += 1 }
        }
        (YMap(entries), i)
      }
    }

    if (lines.isEmpty) YMap(Vector.empty)
    else parseBlock(0, lines.head._1)._1 match {
      case m: YMap => m
      case other => YMap(Vector("" -> other))
    }
  }

  // ------------------------------------------- merge + coercion semantics

  /** `merge_dicts(source=fileConfig, destination=defaultsCopy)` — source
    * values overwrite, nested maps merge, strings coerce per the rules
    * above. We only need the value-coercion half here because the defaults
    * live in [[CrawlConfig]] itself; `coerce` is applied to every scalar
    * read out of the file.
    */
  def coerce(v: YVal): YVal = v match {
    case YStr(s) =>
      if (graft.canon.IpPredicates.isGlobalIp(s)) YStr(s)
      else if (s.nonEmpty && s.charAt(0).isDigit) YNum(s.toDouble)
      else if (s == "False") YBool(false)
      else if (s == "True") YBool(true)
      else YStr(s)
    case YList(items) => YList(items.map(coerce))
    case YMap(e) => YMap(e.map { case (k, x) => k -> coerce(x) })
    case other => other
  }

  // ---------------------------------------------------- CrawlConfig build

  private def warn(msg: String): Unit = {
    val ts = java.time.LocalDateTime.now().format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    System.err.println(s"$ts $msg")
  }

  /** Load a reference `config.yml` and overlay it on the [[CrawlConfig]]
    * defaults. Missing file → defaults (reference FileNotFoundError branch).
    */
  def load(path: String, base: CrawlConfig = CrawlConfig()): CrawlConfig = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) base
    else fromYamlText(new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8), base)
  }

  def fromYamlText(text: String, base: CrawlConfig = CrawlConfig()): CrawlConfig = {
    val root0 = parseYaml(text)
    if (root0.entries.isEmpty) {
      warn("Didn't find anything in the config file. Using defaults.")
      return base
    }
    if (root0.get("http_timeout").isDefined || root0.get("dns_timeout").isDefined ||
        root0.get("save_web_content").isDefined) {
      warn("Incompatible config file loaded (the format changed with v1.2, " +
        "see README). Using defaults instead.")
      return base
    }
    // pre-v1.4: top-level resolvers folds into dns.resolvers (in memory)
    val root = root0.get("resolvers") match {
      case Some(rs) =>
        warn("Incompatible config file loaded (the format changed with v1.4, " +
          "see README). Automatically converting to the new format.")
        val dns = root0.get("dns") match {
          case Some(m: YMap) => YMap(m.entries :+ ("resolvers" -> rs))
          case _ => YMap(Vector("resolvers" -> rs))
        }
        YMap(root0.entries.filterNot(_._1 == "resolvers") :+ ("dns" -> dns))
      case None => root0
    }

    def section(name: String): YMap = root.get(name) match {
      case Some(m: YMap) => m
      case _ => YMap(Vector.empty)
    }
    def bool(m: YMap, k: String, dflt: Boolean): Boolean = m.get(k).map(coerce) match {
      case Some(YBool(b)) => b
      case Some(YNum(d)) => d != 0.0
      case _ => dflt
    }
    def int(m: YMap, k: String, dflt: Int): Int = m.get(k).map(coerce) match {
      case Some(YNum(d)) => d.toInt
      case _ => dflt
    }
    def num(m: YMap, k: String, dflt: Double): Double = m.get(k).map(coerce) match {
      case Some(YNum(d)) => d
      case _ => dflt
    }
    def optInt(m: YMap, k: String, dflt: Option[Int]): Option[Int] =
      m.get(k).map(coerce) match {
        case Some(YNum(d)) => Some(d.toInt)
        case Some(YNull) => None // null = unlimited (config.yml:39)
        case _ => dflt
      }
    def optStr(m: YMap, k: String, dflt: Option[String]): Option[String] =
      m.get(k).map(coerce) match {
        case Some(YStr(s)) => Some(s)
        case Some(YNull) => None
        case _ => dflt
      }
    def strList(m: YMap, k: String, dflt: Seq[String]): Seq[String] =
      m.get(k) match {
        case Some(YList(items)) => items.collect {
          case YStr(s) => s
          case YNum(d) => if (d == d.toLong.toDouble) d.toLong.toString else d.toString
        }
        case _ => dflt
      }
    def intList(m: YMap, k: String, dflt: Seq[Int]): Seq[Int] =
      m.get(k) match {
        case Some(YList(items)) => items.collect { case YNum(d) => d.toInt }
        case _ => dflt
      }

    val geoip = section("geoip")
    val dns = section("dns")
    val timeouts = section("timeouts")
    val mail = section("mail")
    val web = section("web")
    val conn = section("connectivity_check_ips")

    base.copy(
      checkWww = bool(dns, "check_www", base.checkWww),
      authChaosTxt = strList(dns, "auth_chaos_txt", base.authChaosTxt),
      additionalRrtypes = strList(dns, "additional", base.additionalRrtypes),
      jobTimeoutSeconds = int(timeouts, "job", base.jobTimeoutSeconds),
      hardLeafTimeouts = bool(timeouts, "hard_leaf_timeouts", base.hardLeafTimeouts),
      cacheTtlSeconds = int(timeouts, "cache", base.cacheTtlSeconds),
      dnsTimeoutSeconds = num(timeouts, "dns", base.dnsTimeoutSeconds),
      httpTimeoutSeconds = num(timeouts, "http", base.httpTimeoutSeconds),
      httpReadTimeoutSeconds = num(timeouts, "http_read", base.httpReadTimeoutSeconds),
      mailTimeoutSeconds = num(timeouts, "mail", base.mailTimeoutSeconds),
      getBanners = bool(mail, "get_banners", base.getBanners),
      mailPorts = intList(mail, "ports", base.mailPorts),
      maxIpsPerMailHost = int(mail, "max_ips_per_host", base.maxIpsPerMailHost),
      saveContent = bool(web, "save_content", base.saveContent),
      saveBinary = bool(web, "save_binary", base.saveBinary),
      maxRedirects = int(web, "max_redirects", base.maxRedirects),
      contentSizeLimit = int(web, "content_size_limit", base.contentSizeLimit),
      maxIpsPerDomain = optInt(web, "max_ips_per_domain", base.maxIpsPerDomain),
      checkHttp = bool(web, "check_http", base.checkHttp),
      checkHttps = bool(web, "check_https", base.checkHttps),
      checkIpv4 = bool(web, "check_ipv4", base.checkIpv4),
      checkIpv6 = bool(web, "check_ipv6", base.checkIpv6),
      saveIntermediateSteps = bool(web, "save_intermediate_steps", base.saveIntermediateSteps),
      saveCertChain = bool(web, "save_cert_chain", base.saveCertChain),
      flattenOutput = bool(web, "flatten_output", base.flattenOutput),
      webPaths = strList(web, "paths", base.webPaths),
      userAgent = optStr(web, "user_agent", Some(base.userAgent))
        .getOrElse(base.userAgent),
      respectRobots = bool(web, "respect_robots", base.respectRobots),
      connectivityIpv4 = optStr(conn, "ipv4", base.connectivityIpv4),
      connectivityIpv6 = optStr(conn, "ipv6", base.connectivityIpv6),
      saveWorkerHostname = bool(root, "save_worker_hostname", base.saveWorkerHostname),
      geoipCountry = optStr(geoip, "country", base.geoipCountry),
      geoipIsp = optStr(geoip, "isp", base.geoipIsp),
      geoipAsn = optStr(geoip, "asn", base.geoipAsn),
      hstsPreloadFile = optStr(root, "hsts_preload", base.hstsPreloadFile))
  }
}
