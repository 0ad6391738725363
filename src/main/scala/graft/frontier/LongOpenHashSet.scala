package graft.frontier

/** Exact open-addressing hash set of 64-bit keys (linear probing,
  * power-of-two table, resize at 0.7 load). Used by
  * [[graft.plans.CuckooAdmitExec]] so whole-operator first-seen admission
  * is *exactly* equivalent to `dropDuplicates` on the key — a
  * [[CuckooFilter]] fingerprint can false-positive and silently drop the
  * only row for a key, which is fine for the crawl's approximate seen-set
  * (where the snapshot size matters) but not for an operator documented and
  * oracle-checked (q39) as exact dedup.
  *
  * The sentinel slot value 0L marks "empty"; the key 0L itself is tracked
  * by a side flag, so all 2^64 key values are representable.
  *
  * Memory: 8 bytes/slot, ~11.4 bytes/key at the 0.7 load ceiling — for the
  * 1e6-keys/partition scale the admission operator targets, ~16 MB/partition
  * worst-case, well inside executor task memory.
  *
  * Not thread-safe; one instance per partition iterator.
  */
final class LongOpenHashSet(initialCapacity: Int = 1 << 10) {
  private[this] var mask: Int = _
  private[this] var table: Array[Long] = _
  private[this] var used: Int = 0
  private[this] var maxUsed: Int = _
  private[this] var hasZero: Boolean = false

  locally {
    var cap = Integer.highestOneBit(math.max(initialCapacity, 16) - 1) << 1
    if (cap <= 0) cap = 1 << 30
    mask = cap - 1
    table = new Array[Long](cap)
    maxUsed = (cap * 0.7).toInt
  }

  /** 64→64 bit finalizer (splitmix64) so adversarially clustered keys
    * still probe uniformly.
    */
  @inline private[this] def spread(k: Long): Int = {
    var z = k
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt
  }

  def size: Int = used + (if (hasZero) 1 else 0)

  /** Add `k`; returns true iff it was not already present. */
  def add(k: Long): Boolean = {
    if (k == 0L) {
      if (hasZero) false else { hasZero = true; true }
    } else {
      var i = spread(k) & mask
      var v = table(i)
      while (v != 0L) {
        if (v == k) return false
        i = (i + 1) & mask
        v = table(i)
      }
      table(i) = k
      used += 1
      if (used >= maxUsed) grow()
      true
    }
  }

  def contains(k: Long): Boolean = {
    if (k == 0L) hasZero
    else {
      var i = spread(k) & mask
      var v = table(i)
      while (v != 0L) {
        if (v == k) return true
        i = (i + 1) & mask
        v = table(i)
      }
      false
    }
  }

  private[this] def grow(): Unit = {
    val old = table
    val cap = old.length << 1
    require(cap > 0, "LongOpenHashSet: exceeded 2^30 slots per partition")
    mask = cap - 1
    table = new Array[Long](cap)
    maxUsed = (cap * 0.7).toInt
    var j = 0
    while (j < old.length) {
      val k = old(j)
      if (k != 0L) {
        var i = spread(k) & mask
        while (table(i) != 0L) i = (i + 1) & mask
        table(i) = k
      }
      j += 1
    }
  }
}
