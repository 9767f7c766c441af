package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Space-Saving heavy-hitter sketch (Metwally et al.) with the Cafaro et al.
  * parallel merge, ported semantically from the reference kernel
  * `crick/space_saving_stubs.c.in`.
  *
  * State: at most `capacity` counters {item, count, error} held in a circular
  * doubly-linked list over parallel arrays, kept exactly sorted by
  * (count desc, error asc) — `counter_ge` (space_saving_stubs.c.in:112-118) —
  * with head = max and head.prev = min (O(1) eviction), plus an item→slot
  * hash index.
  *
  * Reference contracts preserved:
  *  - eviction path: a new item arriving when full takes count = min_count+1,
  *    error = min_count, IGNORING the supplied count
  *    (space_saving_stubs.c.in:226-232) — replicated exactly;
  *  - merge offsets m1/m2 = each side's min count if full else 0; shared items
  *    add counts+errors; one-sided items get +m_other to both; T2-only items
  *    are inserted in descending order with early break once T1's min counter
  *    dominates (space_saving_stubs.c.in:289-364);
  *  - float64 keys are hashed/compared by raw bits (asint64,
  *    space_saving_stubs.c.in:462-466): -0.0 != 0.0, bit-identical NaNs equal.
  *
  * The int64/object template split (space_saving_stubs.c.in:46-52) maps to
  * [[SpaceSavingLong]] (int64 + bit-cast float64) and [[SpaceSavingObj]]
  * (strings / arbitrary byte keys).
  */
abstract class SpaceSavingBase(val capacity: Int) extends Serializable {
  final val NIL = -1
  var size: Int = 0
  var head: Int = NIL
  val counts = new Array[Long](capacity)
  val errors = new Array[Long](capacity)
  val next = new Array[Int](capacity)
  val prev = new Array[Int](capacity)

  /** Skip index: count value → head-most slot of that count's run.
    *
    * The reference's insert walk (spsv_counter_insert) is O(run length);
    * under near-uniform frequencies runs grow to O(capacity) and ingest
    * degenerates to O(n·capacity) — at 100 TB scale the dominant cost.
    * The run-head index lets the walk hop entire equal-count runs in O(1)
    * while producing EXACTLY the same insertion position (ordering and
    * tie-breaking are unchanged; only the walk is accelerated). */
  private val runHead = new java.util.HashMap[java.lang.Long, Integer]()

  /** Record slot x (just linked / repositioned) as its run's head if it is
    * the head-most node of its count run. */
  @inline private def noteLinked(x: Int): Unit =
    if (x == head || counts(prev(x)) != counts(x)) runHead.put(counts(x), x)

  /** Fix the run-head index before slot x leaves its current count run
    * (count change or physical unlink). Must run while x is still linked
    * and still carries its OLD count. */
  @inline private def noteUnlink(x: Int): Unit = {
    val c = counts(x)
    val rh = runHead.get(c)
    if (rh != null && rh.intValue() == x) {
      val nx = next(x)
      if (nx != x && nx != head && counts(nx) == c) runHead.put(c, nx)
      else runHead.remove(c)
    }
  }

  /** counter_ge: list(i1) >= (count2+offset, error2+offset)?
    * (space_saving_stubs.c.in:112-118) */
  @inline protected final def counterGe(i1: Int, count2: Long, error2: Long,
                                        offset: Long): Boolean = {
    val c = count2 + offset
    val e = error2 + offset
    counts(i1) > c || (counts(i1) == c && errors(i1) <= e)
  }

  /** Insert slot c into the sorted list starting the backward walk at prevIdx
    * (spsv_counter_insert, space_saving_stubs.c.in:121-138), hopping whole
    * equal-count runs via [[runHead]] when the run's count is strictly below
    * the target (same final position as the stepwise walk). */
  protected final def counterInsert(c: Int, prevIdx0: Int): Unit = {
    var prevIdx = prevIdx0
    val tail = prev(head)
    var done = false
    while (!done) {
      if (counterGe(prevIdx, counts(c), errors(c), 0L)) done = true
      else {
        if (counts(prevIdx) < counts(c)) {
          // every node of this run fails counterGe — hop to its head
          val rh = runHead.get(counts(prevIdx))
          if (rh != null) prevIdx = rh.intValue()
        }
        prevIdx = prev(prevIdx)
        if (prevIdx == tail) { head = c; done = true }
      }
    }
    next(c) = next(prevIdx)
    prev(c) = prevIdx
    prev(next(prevIdx)) = c
    next(prevIdx) = c
    noteLinked(c)
  }

  /** Allocate + link slot for a new counter; returns the slot
    * (spsv_counter_new, space_saving_stubs.c.in:141-164). Caller stores the
    * item and the hash entry. */
  protected final def counterNew(count: Long, error: Long): Int = {
    val c = size
    size += 1
    counts(c) = count
    errors(c) = error
    if (head == NIL) {
      head = c; prev(c) = c; next(c) = c
      noteLinked(c)
    } else {
      counterInsert(c, prev(head))
    }
    c
  }

  /** Set a counter's (count, error) and restore sort order — the reference's
    * `counts += c; spsv_rebalance` sequence (space_saving_stubs.c.in:167-183)
    * with run-head index maintenance fused in. */
  protected final def updateCounter(index: Int, newCount: Long, newError: Long): Unit = {
    noteUnlink(index)
    counts(index) = newCount
    errors(index) = newError
    if (head == index) { noteLinked(index); return }
    val p = prev(index)
    if (counterGe(p, newCount, newError, 0L)) { noteLinked(index); return }
    prev(next(index)) = p
    next(p) = next(index)
    counterInsert(index, p)
  }

  // --- item hooks for the shared merge loop (concrete arms own key storage) ---
  /** slot of other's item (at other-slot) in THIS sketch, or NIL. */
  protected def slotOfOtherItem(other: SpaceSavingBase, otherSlot: Int): Int
  /** evict this.slot's item and take other's item (at other-slot). */
  protected def replaceItemFrom(slot: Int, other: SpaceSavingBase, otherSlot: Int): Unit
  /** append other's item (at other-slot) as a new counter with (count, error). */
  protected def appendItemFrom(other: SpaceSavingBase, otherSlot: Int,
      count: Long, error: Long): Unit

  /** Cafaro parallel merge, in place into this (spsv_merge,
    * space_saving_stubs.c.in:289-364). `other` is not mutated. One shared
    * implementation for both key arms. */
  final def mergeBase(other: SpaceSavingBase): Unit = {
    if (other.size == 0) return
    val m1 = minOffset
    val m2 = other.minOffset

    var i1 = 0
    while (i1 < size) {
      val i2 = other.slotOfOtherItem(this, i1)
      if (i2 != NIL) {
        updateCounter(i1, counts(i1) + other.counts(i2),
          errors(i1) + other.errors(i2))
      } else {
        updateCounter(i1, counts(i1) + m2, errors(i1) + m2)
      }
      i1 += 1
    }

    var i2 = other.head
    var c = 0
    var break = false
    while (c < other.size && !break) {
      if (slotOfOtherItem(other, i2) == NIL) {
        if (size == capacity) {
          val t = prev(head)
          if (counterGe(t, other.counts(i2), other.errors(i2), m1)) break = true
          else {
            replaceItemFrom(t, other, i2)
            updateCounter(t, other.counts(i2) + m1, other.errors(i2) + m1)
          }
        } else {
          appendItemFrom(other, i2, other.counts(i2) + m1, other.errors(i2) + m1)
        }
      }
      i2 = other.next(i2)
      c += 1
    }
  }

  /** Min count if full, else 0 (merge offset, space_saving_stubs.c.in:296-305). */
  protected final def minOffset: Long =
    if (size < capacity) 0L else counts(prev(head))

  /** Slots in sorted order (head → tail), first min(k, size) entries. */
  final def topkSlots(k: Int): Array[Int] = {
    val n = math.min(k, size)
    val out = new Array[Int](n)
    var i = head
    var c = 0
    while (c < n) { out(c) = i; i = next(i); c += 1 }
    out
  }
}

/** Space-Saving over int64 keys (also carries bit-cast float64 keys). */
final class SpaceSavingLong(capacity0: Int) extends SpaceSavingBase(capacity0) {
  val items = new Array[Long](capacity)
  // open-addressing item→slot index; tables are tiny (≤ ~4·capacity slots)
  private val mask = {
    var m = 4
    while (m < capacity * 2) m <<= 1
    m - 1
  }
  private val hKeys = new Array[Long](mask + 1)
  private val hVals = new Array[Int](mask + 1)
  java.util.Arrays.fill(hVals, NIL)

  /** khash int64 hash (crick/klib/khash.h:612-613). */
  @inline private def hashOf(k: Long): Int =
    (((k >> 33) ^ k ^ (k << 11)) & mask).toInt

  private def hFind(item: Long): Int = {
    var i = hashOf(item)
    while (hVals(i) != NIL) {
      if (hKeys(i) == item) return i
      i = (i + 1) & mask
    }
    i
  }

  private def hRemove(item: Long): Unit = {
    // tombstone-free removal via backward-shift deletion
    var i = hFind(item)
    if (hVals(i) == NIL) return
    hVals(i) = NIL
    var j = (i + 1) & mask
    while (hVals(j) != NIL) {
      val ideal = hashOf(hKeys(j))
      // can slot j's entry legally move to i? (ideal position not between i and j)
      val between =
        if (i <= j) ideal > i && ideal <= j
        else ideal > i || ideal <= j
      if (!between) {
        hKeys(i) = hKeys(j); hVals(i) = hVals(j)
        hVals(j) = NIL
        i = j
      }
      j = (j + 1) & mask
    }
  }

  def lookup(item: Long): Int = {
    val i = hFind(item)
    if (hVals(i) == NIL) NIL else hVals(i)
  }

  /** Evict slot's item and replace (spsv_swap, space_saving_stubs.c.in:186-210). */
  private def swap(index: Int, item: Long, count: Long, error: Long): Unit = {
    hRemove(items(index))
    items(index) = item
    val i = hFind(item)
    hKeys(i) = item; hVals(i) = index
    updateCounter(index, count, error)
  }

  /** spsv_add (space_saving_stubs.c.in:213-250). */
  def add(item: Long, count: Long = 1L): Unit = {
    val i = hFind(item)
    if (hVals(i) != NIL) {
      val index = hVals(i)
      updateCounter(index, counts(index) + count, errors(index))
    } else if (size == capacity) {
      // full: evict global min; NOTE supplied count is ignored (reference quirk)
      val index = prev(head)
      swap(index, item, counts(index) + 1L, counts(index))
    } else {
      val index = counterNew(count, 0L)
      items(index) = item
      val j = hFind(item)
      hKeys(j) = item; hVals(j) = index
    }
  }

  def merge(other: SpaceSavingLong): Unit = mergeBase(other)

  override protected def slotOfOtherItem(other: SpaceSavingBase, otherSlot: Int): Int =
    lookup(other.asInstanceOf[SpaceSavingLong].items(otherSlot))
  override protected def replaceItemFrom(slot: Int, other: SpaceSavingBase,
      otherSlot: Int): Unit = {
    val item = other.asInstanceOf[SpaceSavingLong].items(otherSlot)
    hRemove(items(slot))
    items(slot) = item
    val i = hFind(item)
    hKeys(i) = item; hVals(i) = slot
  }
  override protected def appendItemFrom(other: SpaceSavingBase, otherSlot: Int,
      count: Long, error: Long): Unit = {
    val item = other.asInstanceOf[SpaceSavingLong].items(otherSlot)
    val idx = counterNew(count, error)
    items(idx) = item
    val j = hFind(item)
    hKeys(j) = item; hVals(j) = idx
  }

  /** Rebuild from counters in sorted order (spsv_set_state,
    * space_saving_stubs.c.in:253-286). */
  def setState(its: Array[Long], cts: Array[Long], ers: Array[Long]): Unit = {
    require(its.length <= capacity, "deserialization failed, size > capacity")
    var i = 0
    while (i < its.length) {
      require(lookup(its(i)) == NIL, "deserialization failed, duplicate items found")
      val idx = counterNew(cts(i), ers(i))
      items(idx) = its(i)
      val j = hFind(its(i))
      hKeys(j) = its(i); hVals(j) = idx
      i += 1
    }
  }

  def serialize(tag: Byte): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 4 + 24 * size)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(tag).putInt(capacity).putInt(size)
    val slots = topkSlots(size)
    var i = 0
    while (i < slots.length) {
      val s = slots(i)
      bb.putLong(items(s)).putLong(counts(s)).putLong(errors(s))
      i += 1
    }
    bb.array()
  }
}

/** Space-Saving over arbitrary reference keys (strings, byte arrays as
  * Base64-stable strings). Mirrors the reference `object` template arm. */
final class SpaceSavingObj(capacity0: Int) extends SpaceSavingBase(capacity0) {
  val items = new Array[String](capacity)
  private val index = new java.util.HashMap[String, Integer](capacity * 2)

  def lookup(item: String): Int = {
    val v = index.get(item)
    if (v == null) NIL else v.intValue()
  }

  private def swap(idx: Int, item: String, count: Long, error: Long): Unit = {
    index.remove(items(idx))
    items(idx) = item
    index.put(item, idx)
    updateCounter(idx, count, error)
  }

  def add(item: String, count: Long = 1L): Unit = {
    val existing = index.get(item)
    if (existing != null) {
      val idx = existing.intValue()
      updateCounter(idx, counts(idx) + count, errors(idx))
    } else if (size == capacity) {
      val idx = prev(head)
      swap(idx, item, counts(idx) + 1L, counts(idx))
    } else {
      val idx = counterNew(count, 0L)
      items(idx) = item
      index.put(item, idx)
    }
  }

  def merge(other: SpaceSavingObj): Unit = mergeBase(other)

  override protected def slotOfOtherItem(other: SpaceSavingBase, otherSlot: Int): Int =
    lookup(other.asInstanceOf[SpaceSavingObj].items(otherSlot))
  override protected def replaceItemFrom(slot: Int, other: SpaceSavingBase,
      otherSlot: Int): Unit = {
    val item = other.asInstanceOf[SpaceSavingObj].items(otherSlot)
    index.remove(items(slot))
    items(slot) = item
    index.put(item, slot)
  }
  override protected def appendItemFrom(other: SpaceSavingBase, otherSlot: Int,
      count: Long, error: Long): Unit = {
    val item = other.asInstanceOf[SpaceSavingObj].items(otherSlot)
    val idx = counterNew(count, error)
    items(idx) = item
    index.put(item, idx)
  }

  def setState(its: Array[String], cts: Array[Long], ers: Array[Long]): Unit = {
    require(its.length <= capacity, "deserialization failed, size > capacity")
    var i = 0
    while (i < its.length) {
      require(lookup(its(i)) == NIL, "deserialization failed, duplicate items found")
      val idx = counterNew(cts(i), ers(i))
      items(idx) = its(i)
      index.put(its(i), idx)
      i += 1
    }
  }

  def serialize(tag: Byte): Array[Byte] = {
    val slots = topkSlots(size)
    val cs = if (tag == SpaceSaving.TagBinary) StandardCharsets.ISO_8859_1
             else StandardCharsets.UTF_8
    val bytes = slots.map(s => items(s).getBytes(cs))
    val payload = bytes.map(_.length + 4 + 16).sum
    val bb = ByteBuffer.allocate(1 + 4 + 4 + payload)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(tag).putInt(capacity).putInt(size)
    var i = 0
    while (i < slots.length) {
      val s = slots(i)
      bb.putInt(bytes(i).length).put(bytes(i))
      bb.putLong(counts(s)).putLong(errors(s))
      i += 1
    }
    bb.array()
  }
}

object SpaceSaving {
  /** serialized key-type tags */
  val TagLong: Byte = 0
  val TagDouble: Byte = 1 // int64-backed, items are doubleToRawLongBits
  val TagString: Byte = 2
  val TagBinary: Byte = 3 // Obj arm; bytes held as ISO-8859-1 strings (1:1)

  /** Lossless byte↔string bridge for binary keys on the Obj arm. */
  def binaryKey(b: Array[Byte]): String =
    new String(b, StandardCharsets.ISO_8859_1)
  def keyToBinary(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)

  /** float64 keys ride the int64 implementation via raw bits
    * (asint64, space_saving_stubs.c.in:462-466). */
  @inline def doubleKey(x: Double): Long = java.lang.Double.doubleToRawLongBits(x)
  @inline def keyToDouble(k: Long): Double = java.lang.Double.longBitsToDouble(k)

  def deserializeTag(bytes: Array[Byte]): Byte = {
    require(bytes.length >= 9, s"not a space-saving sketch: ${bytes.length} bytes")
    val tag = bytes(0)
    require(tag == TagLong || tag == TagDouble || tag == TagString || tag == TagBinary,
      s"not a space-saving sketch: unknown key-type tag $tag")
    tag
  }

  def deserializeLong(bytes: Array[Byte]): SpaceSavingLong = {
    deserializeTag(bytes)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.get() // tag
    val cap = bb.getInt()
    val n = bb.getInt()
    require(cap > 0 && n >= 0 && n <= cap && bytes.length == 9 + 24 * n,
      s"corrupt space-saving sketch: capacity=$cap size=$n in ${bytes.length} bytes")
    val s = new SpaceSavingLong(cap)
    val its = new Array[Long](n); val cts = new Array[Long](n); val ers = new Array[Long](n)
    var i = 0
    while (i < n) { its(i) = bb.getLong(); cts(i) = bb.getLong(); ers(i) = bb.getLong(); i += 1 }
    s.setState(its, cts, ers)
    s
  }

  def deserializeObj(bytes: Array[Byte]): SpaceSavingObj = {
    val tag = deserializeTag(bytes)
    val cs = if (tag == TagBinary) StandardCharsets.ISO_8859_1
             else StandardCharsets.UTF_8
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.get() // tag
    val cap = bb.getInt()
    val n = bb.getInt()
    require(cap > 0 && n >= 0 && n <= cap,
      s"corrupt space-saving sketch: capacity=$cap size=$n")
    val s = new SpaceSavingObj(cap)
    val its = new Array[String](n); val cts = new Array[Long](n); val ers = new Array[Long](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      its(i) = new String(b, cs)
      cts(i) = bb.getLong(); ers(i) = bb.getLong()
      i += 1
    }
    s.setState(its, cts, ers)
    s
  }
}
