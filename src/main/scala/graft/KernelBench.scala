package graft

import graft.core._

/** Single-thread kernel throughput (no Spark): directly comparable to the
  * reference's C kernels, which are likewise single-threaded per stream
  * (crick releases the GIL but never spawns threads). Prints adds/sec per
  * kernel after JIT warm-up. */
object KernelBench {
  private def bench(name: String, n: Long)(run: () => Unit): Unit = {
    run(); run() // warm-up
    val t0 = System.nanoTime()
    run()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"KERNEL $name%-28s ${n / dt / 1e6}%8.1f M adds/s  (${dt}%.3f s for $n)")
  }

  def main(args: Array[String]): Unit = {
    val n = 10_000_000
    val rnd = new java.util.Random(42)
    val xs = Array.fill(n)(rnd.nextGaussian() * 1000)
    val keysSkew = Array.fill(n)((math.abs(rnd.nextGaussian()) * 500).toLong)
    val keysUniform = Array.fill(n)(rnd.nextInt(100000).toLong)

    bench("moments.add", n) { () =>
      val s = new MomentsSketch
      var i = 0
      while (i < n) { s.add(xs(i), 1L); i += 1 }
    }
    bench("tdigest.add (c=100)", n) { () =>
      val t = TDigest(100.0)
      var i = 0
      while (i < n) { t.add(xs(i)); i += 1 }
    }
    bench("spacesaving.add skew cap1k", n) { () =>
      val s = new SpaceSavingLong(1000)
      var i = 0
      while (i < n) { s.add(keysSkew(i)); i += 1 }
    }
    bench("spacesaving.add unif cap4k", n) { () =>
      val s = new SpaceSavingLong(4096)
      var i = 0
      while (i < n) { s.add(keysUniform(i)); i += 1 }
    }
    bench("exactsum.add", n) { () =>
      val s = new ExactSum
      var i = 0
      while (i < n) { s.add(xs(i)); i += 1 }
      s.result()
    }
    // reference point for exactsum.add: a plain double += loop
    bench("naive += (baseline)", n) { () =>
      var acc = 0.0
      var i = 0
      while (i < n) { acc += xs(i); i += 1 }
      if (acc == Double.MinValue) println("") // defeat DCE
    }
    // merge throughput: 1024 pre-built partials folded pairwise
    val parts = Array.fill(256) {
      val t = TDigest(100.0)
      var i = 0
      while (i < 10000) { t.add(rnd.nextGaussian()); i += 1 }
      t.serialize()
    }
    bench("tdigest.merge 256 partials", 256) { () =>
      val acc = TDigest(100.0)
      parts.foreach(p => acc.merge(TDigest.deserialize(p)))
    }
    // CMS blob-direct probe vs full-grid deserialize per probe
    val cms = new CountMin(4, 1 << 16)
    var i = 0
    while (i < 1000000) { cms.add(keysUniform(i)); i += 1 }
    val blob = cms.serialize()
    bench("cms.estimateFromBlob d4w64k", n) { () =>
      var j = 0
      var acc = 0L
      while (j < n) { acc += CountMin.estimateFromBlob(blob, keysUniform(j % 1000000)); j += 1 }
      if (acc == Long.MinValue) println("")
    }
    // Aho-Corasick scan throughput (chars/s): 1000 patterns over ~180 MB
    // of synthetic word salad — the blocklist hot loop
    val vocab = (0 until 5000).map(i => s"w$i")
    val sb = new StringBuilder
    while (sb.length < 200_000) { sb.append(vocab(rnd.nextInt(5000))).append(' ') }
    val page = sb.toString
    val pats = (0 until 1000).map(i => s"w${(i * 17) % 5000} w${(i * 29) % 5000}")
    val ac = AhoCorasick.build(pats)
    val repeats = 900 // ~180M chars total
    bench(s"ahocorasick.count 1k pats (chars)", page.length.toLong * repeats) { () =>
      var j = 0
      var acc = 0L
      while (j < repeats) { acc += ac.countMatches(page); j += 1 }
      if (acc == Long.MinValue) println("")
    }
  }
}
