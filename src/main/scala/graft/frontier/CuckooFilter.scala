package graft.frontier

import graft.ops.TextOps.mix64

/** Partitioned cuckoo-filter seen-set (north rule): 4-way buckets of
  * 16-bit fingerprints, partial-key cuckoo hashing (Fan et al., CoNEXT'14
  * — public algorithm). Properties the frontier depends on:
  *
  *   - **no false negatives**: a key inserted is always found — the seen
  *     set may only over-filter (skip a re-crawl), never under-filter in a
  *     way that loses dedup;
  *   - **O(1)/entry memory**: ~2.4 bytes/key at 95% load (16-bit fp,
  *     4-way). 10^10 frontier entries ≈ 24 GB *total*, i.e. ~24 MB per
  *     partition at 1024 frontier partitions — broadcastable per-partition
  *     state, which is why this scales where a `Set[String]` (≈60 B/key →
  *     600 GB) cannot;
  *   - **snapshot/merge**: `serialize`/`deserialize` round-trip bit-exact
  *     for checkpoint refs; `merge` unions two filters (used when the
  *     frontier is repartitioned).
  *
  * Keys are xxHash64/splitmix64 values of canonicalized punycode domains —
  * hashing happens upstream in Catalyst (`xxhash64` built-in).
  */
final class CuckooFilter private (
    val numBuckets: Int,
    val buckets: Array[Short], // numBuckets * 4 slots
    private var count: Long) extends Serializable {

  import CuckooFilter._

  def size: Long = count

  private def fingerprint(key: Long): Short = {
    val f = (mix64(key) & 0xffffL).toShort
    if (f == 0) 1.toShort else f // 0 = empty slot sentinel
  }

  private def bucket1(key: Long): Int =
    (mix64(key ^ 0x5bd1e995L) & 0x7fffffffL).toInt % numBuckets

  private def bucket2(b1: Int, fp: Short): Int = {
    // partial-key displacement: i2 = i1 xor hash(fp)
    val h = (mix64(fp.toLong & 0xffffL) & 0x7fffffffL).toInt % numBuckets
    val b2 = b1 ^ h
    if (b2 >= numBuckets || b2 < 0) Math.floorMod(b2, numBuckets) else b2
  }

  private def slotInsert(b: Int, fp: Short): Boolean = {
    var i = 0
    while (i < SlotsPerBucket) {
      if (buckets(b * SlotsPerBucket + i) == 0) {
        buckets(b * SlotsPerBucket + i) = fp
        return true
      }
      i += 1
    }
    false
  }

  private def slotContains(b: Int, fp: Short): Boolean = {
    var i = 0
    while (i < SlotsPerBucket) {
      if (buckets(b * SlotsPerBucket + i) == fp) return true
      i += 1
    }
    false
  }

  def contains(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucket1(key)
    slotContains(b1, fp) || slotContains(bucket2(b1, fp), fp)
  }

  /** Insert; returns false only when the filter is saturated after
    * MaxKicks evictions (callers size filters so this never happens; the
    * engine treats failure as a hard error rather than silently dropping
    * dedup guarantees).
    */
  def insert(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucket1(key)
    if (slotContains(b1, fp) || slotContains(bucket2(b1, fp), fp)) return true // idempotent
    if (slotInsert(b1, fp)) { count += 1; return true }
    val b2 = bucket2(b1, fp)
    if (slotInsert(b2, fp)) { count += 1; return true }
    // evict loop — deterministic victim choice (slot index from key mix)
    var curFp = fp
    var b = if ((mix64(key ^ 0xc0ffee) & 1L) == 0L) b1 else b2
    var kicks = 0
    while (kicks < MaxKicks) {
      val slot = (mix64(b.toLong ^ curFp.toLong ^ kicks.toLong) & 0x7fffffffL).toInt % SlotsPerBucket
      val idx = b * SlotsPerBucket + slot
      val victim = buckets(idx)
      buckets(idx) = curFp
      curFp = victim
      b = bucket2(b, curFp)
      if (slotInsert(b, curFp)) { count += 1; return true }
      kicks += 1
    }
    false
  }

  def insertAll(keys: Iterator[Long]): Boolean = {
    var ok = true
    keys.foreach(k => ok &= insert(k))
    ok
  }

  /** Bit-exact snapshot: [numBuckets:int][count:long][slots:short*]. */
  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + buckets.length * 2)
    bb.putInt(numBuckets).putLong(count)
    buckets.foreach(bb.putShort)
    bb.array()
  }

  /** Union with another filter of identical geometry (repartition merge).
    * Re-inserts by fingerprint slots; both filters' keys remain found.
    */
  def merge(other: CuckooFilter): CuckooFilter = {
    require(other.numBuckets == numBuckets, "cuckoo merge: geometry mismatch")
    val out = new CuckooFilter(numBuckets, buckets.clone(), count)
    var b = 0
    while (b < numBuckets) {
      var i = 0
      while (i < SlotsPerBucket) {
        val fp = other.buckets(b * SlotsPerBucket + i)
        if (fp != 0 && !out.slotContains(b, fp) && !out.slotContains(out.bucket2(b, fp), fp)) {
          if (!out.slotInsert(b, fp) && !out.slotInsert(out.bucket2(b, fp), fp)) {
            // extremely full — fall back to any free slot scan (keeps the
            // no-false-negative invariant at the cost of lookup dilution)
            var placed = false
            var bb2 = 0
            while (!placed && bb2 < numBuckets) { placed = out.slotInsert(bb2, fp); bb2 += 1 }
          } else ()
          out.count += 1
        }
        i += 1
      }
      b += 1
    }
    out
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** Filter sized for `capacity` keys at ≤95% load. */
  def create(capacity: Long): CuckooFilter = {
    val slots = Math.max(8L, Math.ceil(capacity / 0.95).toLong)
    var nb = Integer.highestOneBit(Math.max(2, (slots / SlotsPerBucket).toInt))
    if (nb.toLong * SlotsPerBucket < slots) nb <<= 1 // power of two buckets
    new CuckooFilter(nb, new Array[Short](nb * SlotsPerBucket), 0L)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nb = bb.getInt
    val cnt = bb.getLong
    val arr = new Array[Short](nb * SlotsPerBucket)
    var i = 0
    while (i < arr.length) { arr(i) = bb.getShort; i += 1 }
    new CuckooFilter(nb, arr, cnt)
  }
}
