package graft.core

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.unsafe.types.UTF8String

/**
 * In-flight state of a bounded frequent-items ("top-n") sketch.
 *
 * Semantics re-derived from the reference extension (citusdata/postgresql-topn,
 * `topn.c`) but implemented from scratch for the JVM:
 *
 *  - Counters live in a hash map `item -> frequency` (reference:
 *    topn.c:100-106 `TopnAggState` over a PG HTAB).
 *  - Items are UTF-8 strings truncated to at most 255 bytes on ingest, never
 *    splitting a code point (reference: topn.c:51 `MAX_KEYSIZE 256`,
 *    topn.c:337-338 `text_to_cstring_buffer`).
 *  - Frequencies are signed 64-bit with saturating addition at
 *    `Long.MaxValue` (reference: topn.c:997-1009 `IncreaseItemFrequency`).
 *  - Two prune policies (reference: topn.c:869-908 `PruneHashTable`):
 *      policy A (finalize/scalar): if size > n keep the n most frequent
 *        (call sites topn.c:350, 380, 652);
 *      policy B (transition/merge): on inserting a NEW key, if
 *        size > 3*n ("UnionFactor", topn.c:50) keep the size/2 most
 *        frequent (call sites topn.c:441-445, 803-806, 984-988). This
 *        evict-half step is the approximation knob.
 *  - Ordering for prune and report is deterministic in this engine:
 *    frequency descending, then item ascending in UTF-8 byte order
 *    (`UTF8String.compareTo` binary order == code point order). The
 *    reference leaves ties unspecified (topn.c:817-834 returns 0 on equal
 *    frequency + unstable qsort); we pin a total order so results are
 *    stable under Spark's nondeterministic shuffle order (SURVEY §2.8.1).
 *
 * Keys are held as `UTF8String` so the Spark hot paths (aggregate update
 * from a scanned column, merge from MapData, finalize to MapData, byte
 * serialization) run with ZERO `java.lang.String` conversions or copies
 * beyond the defensive clone on first insert (scan buffers are reused, so
 * an inserted key must own its bytes). `java.lang.String` convenience
 * overloads remain for tests and the streaming state.
 *
 * NOT thread-safe (used inside a single aggregation buffer).
 */
final class TopnState private (
    private var counters: java.util.HashMap[UTF8String, java.lang.Long]) extends Serializable {

  import TopnState._

  /** Cumulative eviction-loss bound (see [[lossBound]]). */
  private var evictLoss: Long = 0L

  def size: Int = counters.size

  /**
   * Guaranteed count-interval half-width: for ANY item x,
   * `reported(x) <= true(x) <= reported(x) + lossBound` with
   * `reported(x) = 0` when x is absent. This sketch only ever UNDERcounts
   * — an evicted key's accumulated count is discarded, and a re-entering
   * key restarts from its new increments (unlike classic SpaceSaving,
   * whose takeover-inheritance OVERcounts) — so the bound accumulates one
   * term per prune: the LARGEST discarded frequency, which dominates what
   * any single item can have lost in that prune. 0 while no prune has
   * discarded anything: every count is exact and the interval collapses.
   * Merging states adds their bounds (each side's losses are independent
   * undercounts of the merged stream). Negative frequencies (typed maps
   * may carry them) never tighten the bound: a dropped negative
   * contributes 0.
   */
  def lossBound: Long = evictLoss

  /** Fold an already-materialized sketch's own loss bound into this
    * state's (the union-with-bounds ingest path). */
  def addLossBound(b: Long): Unit = {
    evictLoss = saturatingAdd(evictLoss, math.max(0L, b))
  }

  /** Raw view for tests / materialization. Does not copy. */
  private[graft] def underlying: java.util.HashMap[UTF8String, java.lang.Long] = counters

  /** String view for tests. */
  private[graft] def toStringMap: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b += ((e.getKey.toString, e.getValue.longValue))
    }
    b.result()
  }

  /**
   * Add `count` occurrences of `item` (which may be a transient,
   * buffer-backed UTF8String — it is truncated/cloned only if actually
   * inserted as a new key). Applies prune policy B.
   * Reference: topn.c:393-449 `topn_add_trans`.
   */
  def add(rawItem: UTF8String, count: Long, numCounters: Int): Unit = {
    val item = truncateUtf8(rawItem, MaxKeyBytes)
    val prev = counters.get(item)
    if (prev == null) {
      counters.put(item.clone(), count)
      if (counters.size > UnionFactor * numCounters) {
        pruneToHalf()
      }
    } else {
      counters.put(item, saturatingAdd(prev.longValue, count))
    }
  }

  def add(rawItem: UTF8String, numCounters: Int): Unit = add(rawItem, 1L, numCounters)

  def add(rawItem: String, count: Long, numCounters: Int): Unit =
    add(UTF8String.fromString(rawItem), count, numCounters)

  def add(rawItem: String, numCounters: Int): Unit = add(rawItem, 1L, numCounters)

  /**
   * Merge a materialized sketch entry into this state (policy B per
   * inserted key). Keys arriving from a sketch are NOT truncated; keys
   * longer than 256 bytes are an error, mirroring the reference's
   * asymmetry (truncate-on-add topn.c:337 vs error-on-load topn.c:700-706).
   * Reference: topn.c:753-810 `MergeJsonbIntoTopnAggState`, 955-990
   * `MergeTopn`.
   */
  def mergeEntry(item: UTF8String, freq: Long, numCounters: Int): Unit = {
    if (item.numBytes > MaxKeyBytes + 1) {
      throw graft.GraftErrors.sketchKeyTooLong(MaxKeyBytes + 1)
    }
    val prev = counters.get(item)
    if (prev == null) {
      counters.put(item.clone(), freq)
      if (counters.size > UnionFactor * numCounters) {
        pruneToHalf()
      }
    } else {
      counters.put(item, saturatingAdd(prev.longValue, freq))
    }
  }

  def mergeEntry(item: String, freq: Long, numCounters: Int): Unit =
    mergeEntry(UTF8String.fromString(item), freq, numCounters)

  /** Merge another in-flight state into this one (aggregate COMBINEFUNC).
    * Reference: topn.c:588-625 `topn_union_internal` -> `MergeTopn`.
    * Keys from another state are already owned -> no clone needed, but
    * `mergeEntry` clones only on new-key insert anyway (clone of an owned
    * key is a cheap 1-level copy). */
  def merge(other: TopnState, numCounters: Int): Unit = {
    val it = other.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      mergeEntry(e.getKey, e.getValue.longValue, numCounters)
    }
    // each side's prior losses are independent undercounts of the merged
    // stream; merge-time policy-B prunes accrue via mergeEntry as usual
    addLossBound(other.evictLoss)
  }

  /** Policy B: keep the `size/2` most frequent entries. */
  private def pruneToHalf(): Unit = pruneTo(counters.size / 2)

  /** Policy A: keep at most the `n` most frequent entries (no-op if within
    * budget). Reference: topn.c:869-908 with itemLimit == remaining == n. */
  def prune(n: Int): Unit = {
    if (counters.size > n) pruneTo(n)
  }

  private def pruneTo(remaining: Int): Unit = {
    val arr = sortedEntries()
    val next = new java.util.HashMap[UTF8String, java.lang.Long](
      hashCapacity(remaining), 0.75f)
    var i = 0
    val keep = math.min(remaining, arr.length)
    while (i < keep) {
      next.put(arr(i)._1, arr(i)._2)
      i += 1
    }
    // eviction-loss accounting (see lossBound): the largest discarded
    // frequency bounds any single item's loss in THIS prune; canonical
    // order puts it at arr(keep)
    if (keep < arr.length) {
      evictLoss = saturatingAdd(evictLoss, math.max(0L, arr(keep)._2.longValue))
    }
    counters = next
  }

  /** Entries in canonical order: frequency desc, then item asc (UTF-8
    * binary order). */
  def sortedEntries(): Array[(UTF8String, java.lang.Long)] = {
    val arr = new Array[(UTF8String, java.lang.Long)](counters.size)
    var i = 0
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue)
      i += 1
    }
    java.util.Arrays.sort(arr, EntryOrdering)
    arr
  }

  /** Finalize: prune to at most `numCounters` entries (policy A) and return
    * the materialized entries. Reference: topn.c:632-664 `topn_pack`. */
  def pack(numCounters: Int): Array[(UTF8String, java.lang.Long)] = {
    prune(numCounters)
    sortedEntries()
  }

  /** Top `k` entries in canonical order. Errors if k > numCounters,
    * mirroring topn.c:229-233. */
  def topK(k: Int, numCounters: Int): Array[(String, Long)] = {
    if (k > numCounters) {
      // wording mirrors the reference, topn.c:231-232
      throw graft.GraftErrors.kExceedsCounters(k, numCounters)
    }
    sortedEntries().take(math.min(k, counters.size))
      .map(e => (e._1.toString, e._2.longValue))
  }

  /**
   * Compact wire format for partial-aggregate shipping:
   * varint entryCount, then per entry: varint keyByteLen, key UTF-8 bytes,
   * zigzag-varint frequency; then a trailing zigzag-varint [[lossBound]]
   * (read-if-present on deserialize, so pre-bound payloads — e.g. an old
   * streaming checkpoint — load with bound 0). (The reference ships fixed
   * 264-byte records, topn.c:509-542; we use a denser framing — format is
   * ours to define.)
   */
  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + counters.size * 24)
    val out = new DataOutputStream(bos)
    writeVarLong(out, counters.size.toLong)
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      writeVarLong(out, kb.length.toLong)
      out.write(kb)
      writeVarLong(out, zigzag(e.getValue.longValue))
    }
    writeVarLong(out, zigzag(evictLoss))
    out.flush()
    bos.toByteArray
  }
}

object TopnState {

  /** Reference: topn.c:50 `#define UNION_FACTOR 3`. */
  val UnionFactor = 3

  /** Max key payload bytes (reference MAX_KEYSIZE 256 includes the NUL:
    * topn.c:51, truncation to 255 payload bytes at topn.c:337-338). */
  val MaxKeyBytes = 255

  /** Hash sized like the reference's `(n / 0.75) + 1` (topn.c:735). */
  private def hashCapacity(n: Int): Int =
    math.max(8, (n / 0.75).toInt + 1)

  def empty(numCounters: Int): TopnState =
    new TopnState(new java.util.HashMap[UTF8String, java.lang.Long](
      hashCapacity(numCounters), 0.75f))

  def empty(): TopnState =
    new TopnState(new java.util.HashMap[UTF8String, java.lang.Long](16, 0.75f))

  /** Saturating signed add (reference: topn.c:997-1009, upper bound only;
    * we also guard the lower bound since typed maps may carry negatives). */
  def saturatingAdd(a: Long, b: Long): Long = {
    val r = a + b
    // overflow iff operands share sign and result's sign differs
    if (((a ^ r) & (b ^ r)) < 0) {
      if (a > 0) Long.MaxValue else Long.MinValue
    } else r
  }

  /** Truncate to at most `maxBytes` UTF-8 bytes without splitting a code
    * point (reference: PG `text_to_cstring_buffer` multibyte-safe clip).
    * Returns the input unchanged (no copy) when within budget. */
  def truncateUtf8(s: UTF8String, maxBytes: Int): UTF8String = {
    if (s == null || s.numBytes <= maxBytes) return s
    val bytes = s.getBytes
    var end = maxBytes
    // back off to a UTF-8 sequence start (continuation bytes are 10xxxxxx)
    while (end > 0 && (bytes(end) & 0xC0) == 0x80) end -= 1
    // `end` now points at the first byte of the sequence that would be
    // split; everything before it is whole code points
    UTF8String.fromBytes(bytes, 0, end)
  }

  /** String-side truncation helper (same semantics), used by tests and
    * non-Spark callers. */
  def truncateUtf8(s: String, maxBytes: Int): String = {
    if (s == null) return null
    if (s.length * 3 <= maxBytes) return s
    truncateUtf8(UTF8String.fromString(s), maxBytes).toString
  }

  def utf8Length(s: String): Int =
    s.getBytes(StandardCharsets.UTF_8).length

  /** Compare by UTF-8 byte order (== code point order), matching both
    * Spark's and DuckDB's string ORDER BY. */
  def utf8Compare(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** Canonical report order: frequency desc, then item asc (binary). */
  val EntryOrdering: java.util.Comparator[(UTF8String, java.lang.Long)] =
    new java.util.Comparator[(UTF8String, java.lang.Long)] {
      override def compare(x: (UTF8String, java.lang.Long),
          y: (UTF8String, java.lang.Long)): Int = {
        val c = java.lang.Long.compare(y._2.longValue, x._2.longValue)
        if (c != 0) c else x._1.compareTo(y._1)
      }
    }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def writeVarLong(out: DataOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.writeByte(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  def deserialize(bytes: Array[Byte]): TopnState = {
    var pos = 0
    def readVarLong(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xFF
        pos += 1
        result |= (b & 0x7FL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    val n = readVarLong().toInt
    val st = new TopnState(new java.util.HashMap[UTF8String, java.lang.Long](
      hashCapacity(n), 0.75f))
    var i = 0
    while (i < n) {
      val klen = readVarLong().toInt
      val key = UTF8String.fromBytes(bytes, pos, klen).clone()
      pos += klen
      val freq = unzigzag(readVarLong())
      st.underlying.put(key, java.lang.Long.valueOf(freq))
      i += 1
    }
    if (pos < bytes.length) {
      st.addLossBound(unzigzag(readVarLong()))
    }
    st
  }

  /** Build a state from a materialized sketch, applying policy B per key. */
  def fromSketch(entries: Iterator[(String, Long)], numCounters: Int): TopnState = {
    val st = empty(numCounters)
    while (entries.hasNext) {
      val (k, v) = entries.next()
      st.mergeEntry(k, v, numCounters)
    }
    st
  }
}
