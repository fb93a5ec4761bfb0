package graft.core

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

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
 *    frequency descending, then item ascending in UTF-8 byte order. The
 *    reference leaves ties unspecified (topn.c:817-834 returns 0 on equal
 *    frequency + unstable qsort); we pin a total order so results are
 *    stable under Spark's nondeterministic shuffle order (SURVEY §2.8.1).
 *
 * This class is pure JVM Scala with no Spark dependency so it can be unit /
 * property tested standalone and reused by aggregate expressions, scalar
 * functions and streaming state.
 *
 * NOT thread-safe (used inside a single aggregation buffer).
 */
final class TopnState private (
    private var counters: java.util.HashMap[String, java.lang.Long]) extends Serializable {

  import TopnState._

  def size: Int = counters.size

  /** Raw view for tests / materialization. Does not copy. */
  private[graft] def underlying: java.util.HashMap[String, java.lang.Long] = counters

  /**
   * Add one occurrence (or `count` occurrences) of `item`.
   * The item is truncated to <=255 UTF-8 bytes. Applies prune policy B when
   * a new key pushes the state past `3 * numCounters`.
   * Reference: topn.c:393-449 `topn_add_trans`.
   */
  def add(rawItem: String, count: Long, numCounters: Int): Unit = {
    val item = truncateUtf8(rawItem, MaxKeyBytes)
    upsert(item, count, numCounters)
  }

  def add(rawItem: String, numCounters: Int): Unit = add(rawItem, 1L, numCounters)

  /**
   * Merge a materialized sketch (item -> frequency) into this state,
   * applying policy B per inserted key.
   * Reference: topn.c:753-810 `MergeJsonbIntoTopnAggState`, 955-990
   * `MergeTopn`. Keys arriving from a sketch are NOT truncated; keys longer
   * than 256 bytes are an error, mirroring the reference's asymmetry
   * (truncate-on-add topn.c:337 vs error-on-load topn.c:700-706).
   */
  def mergeEntry(item: String, freq: Long, numCounters: Int): Unit = {
    // <=85 UTF-16 chars can never exceed 256 UTF-8 bytes (max 3 bytes/char).
    if (item.length > 85 && utf8Length(item) > MaxKeyBytes + 1) {
      throw new IllegalArgumentException(
        s"this sketch includes a key which is longer than allowed topn key size (${MaxKeyBytes + 1} bytes)")
    }
    upsert(item, freq, numCounters)
  }

  /** Insert-or-saturating-add; policy-B prune fires only on new-key insert
    * (reference: topn.c:434-446 — `hash_search(..., HASH_ENTER, &found)`). */
  private def upsert(item: String, count: Long, numCounters: Int): Unit = {
    val prev = counters.putIfAbsent(item, count)
    if (prev == null) {
      if (counters.size > UnionFactor * numCounters) {
        pruneToHalf()
      }
    } else {
      counters.put(item, saturatingAdd(prev.asInstanceOf[Long], count))
    }
  }

  /** Merge another in-flight state into this one (aggregate COMBINEFUNC).
    * Reference: topn.c:588-625 `topn_union_internal` -> `MergeTopn`. */
  def merge(other: TopnState, numCounters: Int): Unit = {
    val it = other.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      mergeEntry(e.getKey, e.getValue, numCounters)
    }
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
    val next = new java.util.HashMap[String, java.lang.Long](hashCapacity(remaining), 0.75f)
    var i = 0
    val keep = math.min(remaining, arr.length)
    while (i < keep) {
      next.put(arr(i)._1, arr(i)._2)
      i += 1
    }
    counters = next
  }

  /** Entries in canonical order: frequency desc, then item asc (UTF-8 bytes). */
  def sortedEntries(): Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counters.size)
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
    * the materialized map. Reference: topn.c:632-664 `topn_pack`. */
  def pack(numCounters: Int): Array[(String, Long)] = {
    prune(numCounters)
    sortedEntries()
  }

  /** Top `k` entries in canonical order. Errors if k > numCounters,
    * mirroring topn.c:229-233. */
  def topK(k: Int, numCounters: Int): Array[(String, Long)] = {
    if (k > numCounters) {
      throw new IllegalArgumentException(
        s"requested number of elements ($k) must be less than the " +
          s"number of counters ($numCounters)")
    }
    sortedEntries().take(math.min(k, counters.size))
  }

  /**
   * Compact wire format for partial-aggregate shipping:
   * varint entryCount, then per entry: varint keyByteLen, key UTF-8 bytes,
   * zigzag-varint frequency. (The reference ships fixed 264-byte records,
   * topn.c:509-542; we use a denser framing — format is ours to define.)
   */
  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + counters.size * 16)
    val out = new DataOutputStream(bos)
    writeVarLong(out, counters.size.toLong)
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      writeVarLong(out, kb.length.toLong)
      out.write(kb)
      writeVarLong(out, zigzag(e.getValue))
    }
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
    new TopnState(new java.util.HashMap[String, java.lang.Long](hashCapacity(numCounters), 0.75f))

  def empty(): TopnState = new TopnState(new java.util.HashMap[String, java.lang.Long](16, 0.75f))

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
    * point (reference: PG `text_to_cstring_buffer` multibyte-safe clip). */
  def truncateUtf8(s: String, maxBytes: Int): String = {
    if (s == null) return null
    // Fast path: maximal UTF-8 expansion is 3 bytes per char (4 bytes per
    // surrogate pair = 2 chars), so <= maxBytes/3 chars can never overflow.
    if (s.length * 3 <= maxBytes) return s
    var bytes = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w =
        if (cp < 0x80) 1
        else if (cp < 0x800) 2
        else if (cp < 0x10000) 3
        else 4
      if (bytes + w > maxBytes) return s.substring(0, i)
      bytes += w
      i += Character.charCount(cp)
    }
    s
  }

  def utf8Length(s: String): Int = {
    var bytes = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      bytes +=
        (if (cp < 0x80) 1
         else if (cp < 0x800) 2
         else if (cp < 0x10000) 3
         else 4)
      i += Character.charCount(cp)
    }
    bytes
  }

  /** Compare by Unicode code point (== UTF-8 unsigned byte order), matching
    * how both Spark (`UTF8String.compareTo`) and DuckDB order strings —
    * required so our tie-break agrees with SQL `ORDER BY item`. */
  def utf8Compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  /** Canonical report order: frequency desc, then item asc. */
  val EntryOrdering: java.util.Comparator[(String, Long)] =
    new java.util.Comparator[(String, Long)] {
      override def compare(x: (String, Long), y: (String, Long)): Int = {
        val c = java.lang.Long.compare(y._2, x._2)
        if (c != 0) c else utf8Compare(x._1, y._1)
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
    val st = new TopnState(new java.util.HashMap[String, java.lang.Long](hashCapacity(n), 0.75f))
    var i = 0
    while (i < n) {
      val klen = readVarLong().toInt
      val key = new String(bytes, pos, klen, StandardCharsets.UTF_8)
      pos += klen
      val freq = unzigzag(readVarLong())
      st.underlying.put(key, freq)
      i += 1
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
