package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / hostname extraction for crawl frontier discovery and corpus link
  * analysis.
  *
  * The reference crawler only ever follows redirect `Location` targets
  * (`web_utils.py:202-223`) — it never grows its domain list. A web-scale
  * frontier does: hosts discovered inside fetched documents re-enter the
  * frontier through the same canonicalize → punycode → xxhash64 →
  * seen-filter admission path as seeds (north rule: URL-frontier with a
  * cuckoo URL-seen set). This object holds the extraction primitive in two
  * twins:
  *
  *   - [[extractedHosts]]: a codegen'd `Column` tree (`regexp_extract_all`
  *     + higher-order `transform`/`array_distinct`) for relational
  *     pipelines — the corpus never leaves whole-stage codegen and the
  *     pattern is written in the RE2 ∩ java.util.regex common subset so a
  *     DuckDB oracle can replay it exactly (no lookaround, no
  *     backreferences);
  *   - [[extractHosts]]: an allocation-conscious Scala twin for the
  *     imperative probe leaves (the engine's per-result discovery hook),
  *     byte-for-byte the same matches.
  *
  * Extraction is deliberately scheme-anchored (`http://` / `https://`):
  * bare "example.net" prose tokens are NOT links (a crawler that admits
  * every domain-shaped word drowns its frontier in false positives).
  */
object LinkOps {

  /** Host capture from an absolute http(s) URL. Input is lowercased before
    * matching (cheaper than `(?i)` per-char case folding in both engines,
    * and makes the captured host already-lowercase). The host must end in
    * an alphabetic TLD of length ≥ 2; a trailing root dot, a `:port`, a
    * path, or any other delimiter simply falls outside the capture.
    */
  val UrlHostPattern: String = "https?://([a-z0-9.-]+\\.[a-z]{2,})"

  /** Distinct hosts referenced by absolute URLs in `text`, in no particular
    * order (`array_distinct` keeps first-occurrence order; consumers that
    * need a set treat it as one). Null text → null (Spark regexp semantics),
    * so gate with `coalesce` when aggregating.
    */
  def extractedHosts(text: Column): Column =
    array_distinct(regexp_extract_all(lower(text), lit(UrlHostPattern), lit(1)))

  private val UrlHostRegex = UrlHostPattern.r

  /** Scala twin of [[extractedHosts]]: distinct hosts, first-occurrence
    * order, identical matches to the relational path.
    */
  def extractHosts(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val lower = text.toLowerCase
    if (!lower.contains("http")) return Seq.empty // cheap pre-gate
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    UrlHostRegex.findAllMatchIn(lower).foreach(m => out += m.group(1))
    out.toSeq
  }
}
