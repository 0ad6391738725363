package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import graft.probes.{CrawlConfig, Probes}
import graft.spans.JsonSink
import graft.universe.Universe

/** K1 structural conformance against the reference's OWN schema
  * (`/root/reference/result-schema.json`, read-only): every emitted
  * document must carry the schema's `required` keys at the top level,
  * under `results`, and under `DNS_LOCAL`, and must not emit keys the
  * schema doesn't know (modulo config-gated additional-RR keys, which the
  * reference appends dynamically too, `crawl.py:61-69`).
  */
class SchemaConformanceSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val schema: JsonNode =
    mapper.readTree(new java.io.File("/root/reference/result-schema.json"))

  private def req(node: JsonNode): Set[String] = {
    val r = node.get("required")
    if (r == null) Set.empty
    else (0 until r.size).map(r.get(_).asText).toSet
  }
  private def props(node: JsonNode): Set[String] = {
    val p = node.get("properties")
    if (p == null) Set.empty
    else {
      val it = p.fieldNames()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  private val u = new Universe(seed = 42L)
  private val cfg = CrawlConfig()
  private val p = new Probes(u, cfg)

  private def emitted(domain: String): JsonNode =
    mapper.readTree(JsonSink.toJson(p.processDomain(domain, "2026-01-01 00:00:00"), cfg))

  private def keys(n: JsonNode): Set[String] = {
    val it = n.fieldNames()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  test("every emitted document carries the schema's required keys at all three levels") {
    val topReq = req(schema)
    val resSchema = schema.get("properties").get("results")
    val resReq = req(resSchema)
    val dlSchema = resSchema.get("properties").get("DNS_LOCAL")
    val dlReq = req(dlSchema)
    ("nic.cz" +: (0 to 150).map(i => s"d$i.cz")).foreach { d =>
      val doc = emitted(d)
      assert(topReq.subsetOf(keys(doc)), s"$d top-level missing ${topReq -- keys(doc)}")
      val res = doc.get("results")
      assert(resReq.subsetOf(keys(res)), s"$d results missing ${resReq -- keys(res)}")
      val dl = res.get("DNS_LOCAL")
      assert(dlReq.subsetOf(keys(dl)), s"$d DNS_LOCAL missing ${dlReq -- keys(dl)}")
    }
  }

  test("no unknown keys beyond the schema's property sets (gate-absent keys allowed)") {
    val resKnown = props(schema.get("properties").get("results")) + "WEB_paths"
    val dlKnown = props(schema.get("properties").get("results")
      .get("properties").get("DNS_LOCAL"))
    (0 to 150).map(i => s"d$i.cz").foreach { d =>
      val doc = emitted(d)
      assert(keys(doc).subsetOf(Set("domain", "timestamp", "results", "worker_hostname")),
        s"$d unknown top-level keys: ${keys(doc)}")
      assert(keys(doc.get("results")).subsetOf(resKnown),
        s"$d unknown results keys: ${keys(doc.get("results")) -- resKnown}")
      assert(keys(doc.get("results").get("DNS_LOCAL")).subsetOf(dlKnown),
        s"$d unknown DNS_LOCAL keys: ${keys(doc.get("results").get("DNS_LOCAL")) -- dlKnown}")
    }
  }

  test("web combo keys and record shapes match the schema vocabulary") {
    val webKnown = props(schema.get("properties").get("results")
      .get("properties").get("WEB"))
    val recordKeys = Set("value", "cname", "from_cname", "algorithm", "geoip")
    (0 to 150).map(i => s"d$i.cz").foreach { d =>
      val doc = emitted(d)
      val web = doc.get("results").get("WEB")
      if (web != null && web.isObject)
        assert(keys(web).subsetOf(webKnown), s"$d unknown WEB keys: ${keys(web) -- webKnown}")
      val ns = doc.get("results").get("DNS_LOCAL").get("NS_AUTH")
      if (ns != null && ns.isArray)
        (0 until ns.size).foreach { i =>
          assert(keys(ns.get(i)).subsetOf(recordKeys),
            s"$d NS_AUTH[$i] unknown keys: ${keys(ns.get(i))}")
        }
    }
  }
}
