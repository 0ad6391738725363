package graft.universe

/** HSTS preload list from a real newline file (S9 closure; reference
  * `hsts_utils.py:23-24`: `in_hsts_preload(idna.encode(domain))` against
  * the packaged Chromium list).
  *
  * File format: one entry per line — `domain` (exact match) or
  * `domain includeSubdomains` (matches the domain and every subdomain,
  * the Chromium list's include_subdomains attribute; the reference's
  * hstspreload package honors ancestors the same way). Blank lines and
  * `#` comments ignored. Entries are canonicalized (lowercase + IDNA
  * punycode — the `idna.encode` analog) at load; probes canonicalize the
  * queried host before lookup.
  *
  * Loaded once per JVM per path (executors share the cache — the list is
  * a read-only dimension like the mmdb databases), wrapped as a
  * ProbeService decorator like [[GeoMmdbService]]: only the hstsPreload
  * leaf changes, everything else forwards.
  */
object HstsPreload {
  final case class Table(exact: Set[String], subtree: Set[String]) {
    def contains(domain: String): Boolean = {
      val d = graft.canon.Canon.canonicalize(domain)
      if (exact.contains(d) || subtree.contains(d)) return true
      var i = d.indexOf('.')
      while (i >= 0) {
        if (subtree.contains(d.substring(i + 1))) return true
        i = d.indexOf('.', i + 1)
      }
      false
    }
    def size: Int = exact.size + subtree.size
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Table]()

  def load(path: String): Table = cache.computeIfAbsent(path, p => {
    val ex = Set.newBuilder[String]
    val sub = Set.newBuilder[String]
    val src = scala.io.Source.fromFile(p, "UTF-8")
    try src.getLines().foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val toks = line.split("\\s+")
        val d = graft.canon.Canon.canonicalize(toks(0))
        if (toks.exists(_.equalsIgnoreCase("includeSubdomains"))) sub += d
        else ex += d
      }
    } finally src.close()
    Table(ex.result(), sub.result())
  })
}

/** Decorator that answers the HSTS-preload leaf from a real list file; a
  * configured-but-missing file disables the override with a warning (the
  * same degrade-don't-fail contract as [[GeoMmdbService]]).
  */
class HstsPreloadService(inner: graft.probes.ProbeService, path: String)
    extends graft.probes.ForwardingProbeService(inner) {

  private val enabled: Boolean = {
    val ok = java.nio.file.Files.exists(java.nio.file.Paths.get(path))
    if (!ok)
      System.err.println(s"HSTS preload list cannot be found in '$path'. Disabling.")
    ok
  }

  override def hstsPreload(domain: String): Boolean =
    if (enabled) HstsPreload.load(path).contains(domain)
    else inner.hstsPreload(domain)
}
