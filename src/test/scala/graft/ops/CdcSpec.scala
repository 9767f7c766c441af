package graft.ops

import graft.SparkTestBase
import graft.expr.{TextHash, TextKernels}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level content-defined chunking (cdc_chunk_hashes / Dedup.cdcPairs):
  * independent reference, re-synchronization property, pair generation. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference: every window hashed from scratch (no rolling),
    * boundaries collected, chunks sliced and FNV-hashed. */
  private def reference(s: String, bits: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    if (b.length == 0) return Nil
    if (b.length < 16) return Seq(TextHash.hashBytes(b, 0, b.length, 0L))
    val mask = (1L << bits) - 1
    def win(w: Int): Long = {
      var h = 0L
      (w until w + 16).foreach(i => h = h * TextHash.FnvPrime + (b(i) & 0xffL))
      TextHash.avalanche(h)
    }
    val cuts = (0 to b.length - 16).filter(w => (win(w) & mask) == 0L)
      .map(_ + 16)
    val bounds = (0 +: cuts) :+ b.length
    bounds.zip(bounds.tail).collect {
      case (a, z) if z > a => TextHash.hashBytes(b, a, z, 0L)
    }
  }

  private def kernel(s: String, bits: Int): Seq[Long] =
    TextKernels.cdcChunkHashes(UTF8String.fromString(s), bits)
      .toLongArray().toSeq

  test("kernel == from-scratch reference on random strings (incl. UTF-8)") {
    val rnd = new scala.util.Random(77)
    val alphabets = Seq("abcdefgh", "xy01_зюß中文", " \tmixed ws ")
    for (trial <- 1 to 40) {
      val alpha = alphabets(trial % alphabets.length)
      val s = Seq.fill(rnd.nextInt(300))(alpha(rnd.nextInt(alpha.length)))
        .mkString
      val bits = 1 + rnd.nextInt(6)
      assert(kernel(s, bits) == reference(s, bits), s"trial $trial bits=$bits")
    }
    assert(kernel("", 6).isEmpty)
    assert(kernel("short", 6) == Seq(TextHash.hashBytes(
      "short".getBytes("UTF-8"), 0, 5, 0L)))
  }

  test("boundaries re-synchronize after an insertion (no token structure)") {
    // a long whitespace-FREE string: token spans cannot exist here
    val rnd = new scala.util.Random(5)
    val s = Seq.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val shifted = "INSERTED" + s
    val a = kernel(s, 5).toSet
    val c = kernel(shifted, 5).toSet
    assert(a.size > 10, s"fixture should chunk well, got ${a.size}")
    // all chunks after the first boundary are byte-identical → shared
    val shared = a.intersect(c).size.toDouble / a.size
    assert(shared > 0.8, s"CDC must survive a prefix insertion: $shared")
  }

  test("cdcPairs finds byte-level dups across docs; hot chunks drop") {
    val rnd = new scala.util.Random(11)
    val core = Seq.fill(1500)(('a' + rnd.nextInt(26)).toChar).mkString
    val other = Seq.fill(1500)(('A' + rnd.nextInt(26)).toChar).mkString
    val df = Seq(
      (1L, core), (2L, "PREFIX-" + core), (3L, other),
      (4L, core + "-SUFFIX")).toDF("doc_id", "text")
    val got = Dedup.cdcPairs(df, "doc_id", "text", bits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair among {1,2,4} shares chunks; 3 shares with nobody
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // a chunk present in >maxDocsPerChunk docs is boilerplate and drops:
    // with the cap at 2, the three-way shared chunks disappear
    val capped = Dedup.cdcPairs(df, "doc_id", "text", bits = 5,
      maxDocsPerChunk = 2)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cappedPairs.contains((1L, 2L)) || cappedPairs.size < got.size)
  }
}
