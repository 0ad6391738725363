package graft.universe

import java.nio.charset.StandardCharsets
import java.security.{KeyPair, KeyPairGenerator, PrivateKey, PublicKey, SecureRandom, Signature, KeyFactory}
import java.security.spec.X509EncodedKeySpec
import java.util.Base64

/** Real-cryptography DNSSEC path behind the ProbeService seam (F7 closure:
  * the reference's `dns.dnssec.validate` call, `dns_utils.py:42-70`,
  * performs actual signature verification; the `check_dnssec` classifier,
  * `dns_utils.py:73-127`, branches on the outcome). Two decorators compose
  * over any inner service:
  *
  *  - [[SigningDnssecService]] — for domains whose zone the inner service
  *    reports signed/bogus, replaces the DNSKEY/RRSIG leaves with a REAL
  *    RSA-2048 public key (RFC 4034 algorithm 8, RSASHA256; presentation
  *    `flags protocol algorithm base64-key`) and a REAL SHA256withRSA
  *    signature over the zone's canonical A-rrset bytes. RSA signatures
  *    are deterministic (PKCS#1 v1.5), so the probe-leaf determinism
  *    contract holds; "bogus" zones sign corrupted bytes, so their
  *    signature is present but cryptographically invalid — exactly the
  *    reference's SERVFAIL-on-validation-failure shape.
  *  - [[VerifyingDnssecService]] — replaces the inner `dnssecState`
  *    attribute with the verdict of `java.security.Signature` verify:
  *    DNSKEY + RRSIG fetched through the seam, verified, mapped to the
  *    reference's states (verifies → "signed"; present but invalid →
  *    "bogus"; no records → "unsigned"). [[graft.probes.Probes.checkDnssec]]
  *    — the classifier — runs UNCHANGED on top, so the valid/rrsig/
  *    message/error JSON shape is untouched.
  *
  * Documented simplifications: the key rides in X.509 SPKI base64 (not
  * RFC 4034 wire format) and the signed bytes are `name|A|sorted-rdata`
  * (not the full RFC 4034 §6 canonical wire RR encoding) — neither
  * changes the validation semantics exercised: a signature over the
  * rrset, verified with the zone key, corrupt anywhere → invalid.
  */
object DnssecCrypto {

  /** Deterministic RSA-2048 keypair: SHA1PRNG seeded with `seed` yields
    * the same primes on every JVM — one keygen per (JVM, seed).
    */
  private val kpCache = new java.util.concurrent.ConcurrentHashMap[Long, KeyPair]()
  def keyPair(seed: Long): KeyPair = kpCache.computeIfAbsent(seed, s => {
    val rng = SecureRandom.getInstance("SHA1PRNG")
    rng.setSeed(s)
    val gen = KeyPairGenerator.getInstance("RSA")
    gen.initialize(2048, rng)
    gen.generateKeyPair()
  })

  /** Canonical rrset bytes (simplified §6 form — see object doc). */
  def canonicalRrset(domain: String, rdata: Seq[String]): Array[Byte] =
    (domain + "|A|" + rdata.sorted.mkString("\n"))
      .getBytes(StandardCharsets.UTF_8)

  def sign(data: Array[Byte], priv: PrivateKey): Array[Byte] = {
    val s = Signature.getInstance("SHA256withRSA")
    s.initSign(priv)
    s.update(data)
    s.sign()
  }

  def verify(data: Array[Byte], sig: Array[Byte], pub: PublicKey): Boolean =
    try {
      val s = Signature.getInstance("SHA256withRSA")
      s.initVerify(pub)
      s.update(data)
      s.verify(sig)
    } catch { case _: Exception => false } // malformed sig = invalid, not a crash

  def decodePublic(b64: String): Option[PublicKey] =
    try Some(KeyFactory.getInstance("RSA")
      .generatePublic(new X509EncodedKeySpec(Base64.getDecoder.decode(b64))))
    catch { case _: Exception => None }
}

/** Serves a real zone key + real signature for signed zones (invalid
  * signature for bogus zones). See [[DnssecCrypto]].
  */
class SigningDnssecService(inner: graft.probes.ProbeService, seed: Long = 42L)
    extends graft.probes.ForwardingProbeService(inner) {

  @transient private lazy val kp = DnssecCrypto.keyPair(seed)
  @transient private lazy val pubB64 =
    Base64.getEncoder.encodeToString(kp.getPublic.getEncoded)

  override def dnskeyFor(domain: String): Seq[String] =
    inner.dnssecState(domain) match {
      case "unsigned" => Seq.empty
      // KSK flags 257, protocol 3, algorithm 8 = RSASHA256 (IANA)
      case _ => Seq(s"257 3 8 $pubB64")
    }

  override def rrsigFor(domain: String): Seq[String] =
    inner.dnssecState(domain) match {
      case "unsigned" => Seq.empty
      case state =>
        val data =
          if (state == "bogus") // signature exists but covers wrong bytes
            DnssecCrypto.canonicalRrset(domain + "|CORRUPT", inner.aFor(domain))
          else DnssecCrypto.canonicalRrset(domain, inner.aFor(domain))
        val sig = Base64.getEncoder.encodeToString(
          DnssecCrypto.sign(data, kp.getPrivate))
        // presentation: type alg labels ttl expiry inception keytag signer sig
        Seq(s"A 8 2 3600 20270101000000 20260101000000 12345 $domain. $sig")
    }
}

/** Replaces the synthetic validity attribute with real verification —
  * `dnssecState` becomes a cryptographic verdict. See [[DnssecCrypto]].
  */
class VerifyingDnssecService(inner: graft.probes.ProbeService)
    extends graft.probes.ForwardingProbeService(inner) {

  override def dnssecState(domain: String): String = {
    val keys = inner.dnskeyFor(domain)
    val sigs = inner.rrsigFor(domain)
    if (keys.isEmpty || sigs.isEmpty) return "unsigned"
    val verdicts = for {
      key <- keys.iterator
      keyB64 = key.trim.split("\\s+").drop(3).mkString("")
      pub <- DnssecCrypto.decodePublic(keyB64).iterator
      sig <- sigs.iterator
      sigB64 = sig.trim.split("\\s+").last
      raw <- (try Some(Base64.getDecoder.decode(sigB64)) catch {
        case _: Exception => None
      }).iterator
    } yield DnssecCrypto.verify(
      DnssecCrypto.canonicalRrset(domain, inner.aFor(domain)), raw, pub)
    if (verdicts.exists(identity)) "signed" else "bogus"
  }
}
