package graft.frontier

import scala.collection.mutable

import graft.model.Model.FrontierEntry

/** Token-bucket politeness (north rule: per resolver / nameserver-bucket
  * rate limit; semantic twin of the reference's probe-cache + soft-start
  * throttles, `workers.py:126-129`, `dns_utils.py:236-241`).
  *
  * Deterministic: time is a round counter, not a wall clock, so the pop
  * schedule is a pure function of (seeds, budgets) — required for the
  * N-vs-4N ordering-equality criterion.
  */
final class TokenBucket(val capacity: Double, val refillPerRound: Double)
    extends Serializable {
  private var tokens: Double = capacity

  def tryTake(n: Double = 1.0): Boolean =
    if (tokens >= n) { tokens -= n; true } else false

  def tick(): Unit = tokens = math.min(capacity, tokens + refillPerRound)

  def available: Double = tokens
}

/** Per-partition binary min-heap keyed `(nsBucket, priority, seq)` — the
  * frontier's pop order (north rule). Pop order is total and deterministic:
  * ties in (bucket, priority) break on the stable input `seq`.
  */
final class FrontierHeap extends Serializable {
  private val ord: Ordering[FrontierEntry] =
    Ordering.by(e => (e.nsBucket, e.priority, e.seq))
  // mutable.PriorityQueue is a max-heap; reverse for min-heap semantics
  private val pq = mutable.PriorityQueue.empty[FrontierEntry](ord.reverse)

  def push(e: FrontierEntry): Unit = pq.enqueue(e)
  def pushAll(es: IterableOnce[FrontierEntry]): Unit = es.iterator.foreach(pq.enqueue(_))
  def pop(): FrontierEntry = pq.dequeue()
  def peek: Option[FrontierEntry] = pq.headOption
  def nonEmpty: Boolean = pq.nonEmpty
  def size: Int = pq.size

  /** Pop up to `budget(bucket)` entries per nameserver bucket this round —
    * the admission step under politeness. Entries over budget stay queued.
    */
  def popRound(budget: Int => Int): Vector[FrontierEntry] = {
    val taken = mutable.Map.empty[Int, Int].withDefaultValue(0)
    val kept = mutable.ArrayBuffer.empty[FrontierEntry]
    val out = Vector.newBuilder[FrontierEntry]
    while (pq.nonEmpty) {
      val e = pq.dequeue()
      if (taken(e.nsBucket) < budget(e.nsBucket)) {
        taken(e.nsBucket) += 1
        out += e
      } else kept += e
    }
    kept.foreach(pq.enqueue(_))
    out.result()
  }
}

/** TTL'd policy cache (robots/zone-transfer policy per nameserver bucket;
  * north rule). Refresh-on-read mirrors the reference's Redis `expire`
  * refresh (`dns_utils.py:237-241`, TTL `config.yml:23`).
  */
final class PolicyCache(ttlRounds: Int) extends Serializable {
  private case class Entry(var value: Int, var expiresAt: Long)
  private val m = mutable.Map.empty[Int, Entry]

  def get(bucket: Int, round: Long, fetch: Int => Int): Int = m.get(bucket) match {
    case Some(e) if e.expiresAt > round =>
      e.expiresAt = round + ttlRounds // refresh-on-read
      e.value
    case _ =>
      val v = fetch(bucket)
      m(bucket) = Entry(v, round + ttlRounds)
      v
  }

  def size: Int = m.size
}
