package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Deterministic Lloyd's k-means (Similarity.kmeansFit). */
class KMeansSpec extends SparkTestBase {
  import org.apache.spark.sql.functions.{element_at => elemAt}

  test("PQ: encode codes match per-subspace brute-force argmax; ADC ranks dups first") {
    import spark.implicits._
    // 4-dim vectors, 2 subspaces of 2; codebook = first 2 vectors' slices
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),   // near vec 0 in both subspaces
      (3L, Seq(0.1f, 0.9f, 0.9f, 0.1f)),   // near vec 1 in both subspaces
      (4L, Seq(1.0f, 0.0f, 1.0f, 0.0f))    // mixed: sub0→0, sub1→1
    ).toDF("id", "vec")
    val base = vecs.where($"id" < 2).orderBy("id")
      .select($"vec".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq)
    val cbs: Similarity.PqCodebooks =
      (0 until 2).map(i => base.map(v => v.slice(i * 2, i * 2 + 2)))
    val encoded = vecs.select($"id",
      Similarity.pqEncode($"vec", cbs, 2).as("codes"))
    val codes = encoded.select($"id", elemAt($"codes", 1), elemAt($"codes", 2))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(codes == Map(0L -> ((0, 0)), 1L -> ((1, 1)), 2L -> ((0, 0)),
      3L -> ((1, 1)), 4L -> ((0, 1))))
    // ADC vs query vec 0: its own cluster (ids 0, 2) must outrank cluster 1
    val adc = Similarity.pqAdcScores(encoded, vecs.where($"id" === 0),
        "id", "vec", "codes", cbs, 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(adc(0L) == adc(2L))            // same codes → identical ADC
    assert(adc(0L) > adc(4L) && adc(4L) > adc(1L))
    assert(adc(1L) == adc(3L))
  }

  test("ivfPq: full probe == global ADC ranking; partial probe restricts cells") {
    import spark.implicits._
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(8)(d => (((i * 13 + d * 5) % 17).toFloat - 8f) / 8f)))
      .toDF("id", "vec")
    val idx = Similarity.ivfPqBuild(vecs, "id", "vec",
      nCenters = 4, m = 2, subDim = 4, ksub = 4, maxIters = 3)
    // probing EVERY cell makes IVF-PQ == plain ADC ranking over all codes
    val full = Similarity.ivfPqTopK(idx, vecs.where($"id" < 3), "id", "vec",
      k = 10, nProbe = 4)
    val adcAll = Similarity.pqAdcScores(
        idx.assigned.select("id", "codes"), vecs.where($"id" < 3),
        "id", "vec", "codes", idx.codebooks, idx.subDim)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(round($"adc_dot", 6).desc, $"id")
    val expect = adcAll.withColumn("rank", row_number().over(w))
      .where($"rank" <= 10)
      .select($"query_id", $"id", round($"adc_dot", 6).as("adc_dot"), $"rank")
    assert(full.exceptAll(expect).isEmpty && expect.exceptAll(full).isEmpty)
    // nProbe=1: every hit lives in the query's own probed cell
    val narrow = Similarity.ivfPqTopK(idx, vecs.where($"id" < 3), "id", "vec",
      k = 5, nProbe = 1)
    val cells = idx.assigned.select($"id", $"centroid")
    val joined = narrow.join(cells, Seq("id"))
      .join(cells.select($"id".as("query_id"), $"centroid".as("qc")), Seq("query_id"))
    assert(joined.where($"centroid" =!= $"qc").isEmpty)
  }

  test("ivfPqTopKRefined: exact-best of the candidate superset; recall strictly improves") {
    import spark.implicits._
    val emb = spark.read.parquet(sf("embeddings"))
    val base = emb.where($"vec_id" < 8)
      .select($"vec_id", $"embedding".cast("array<double>").as("__v"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toSeq).toSeq
    val cbs: Similarity.PqCodebooks =
      (0 until 4).map(i => base.map(v => v.slice(i * 16, i * 16 + 16)))
    val assigned = emb.select($"vec_id",
      element_at(graft.api.functions.nearest_centroids(
        $"embedding", typedLit(base), 1), 1).as("centroid"),
      Similarity.pqEncode($"embedding", cbs, 16).as("codes"))
    val idx = Similarity.IvfPqIndex(base, cbs, 16, assigned)
    val queries = emb.where($"vec_id" < 10)

    val adc = Similarity.ivfPqTopK(idx, queries, "vec_id", "embedding",
      k = 10, nProbe = 2)
    val refined = Similarity.ivfPqTopKRefined(idx, emb, queries, "vec_id",
      "embedding", k = 10, rerank = 40, nProbe = 2)
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 10)
      .select($"query_id", $"neighbor_id".as("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(truth).size
    val (ha, hr) = (hits(adc), hits(refined))
    assert(hr > ha, s"re-rank must strictly improve recall: adc=$ha refined=$hr")

    // refined keeps every true top-10 member that entered the candidate
    // list at all — quantization can no longer evict it
    val cand40 = Similarity.ivfPqTopK(idx, queries, "vec_id", "embedding",
        k = 40, nProbe = 2)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refinedSet = refined.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.intersect(cand40).subsetOf(refinedSet))

    // only the candidate set ships vectors: both refinement joins broadcast
    refined.collect()
    val plan = refined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("appendToIvfPqIndex: grown layout searches ≡ built-whole layout") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(sf("embeddings"))
    val whole = java.nio.file.Files.createTempDirectory("ivfW").toString
    val grown = java.nio.file.Files.createTempDirectory("ivfG").toString
    // TRAINED quantizers (not the fixture's fixed ones): train on the
    // full corpus once, then assign whole vs build-half-append-half —
    // append must pick the quantizers up from the stored meta
    val idx = Similarity.ivfPqBuild(emb, "vec_id", "embedding",
      nCenters = 4, m = 4, subDim = 16, ksub = 8, maxIters = 3)
    Similarity.saveIvfPqIndex(idx, whole)
    Similarity.saveIvfPqIndex(
      Similarity.IvfPqIndex(idx.centroids, idx.codebooks, idx.subDim,
        idx.assigned.join(emb.where(col("vec_id") % 2 === 0)
          .select("vec_id"), Seq("vec_id"))),
      grown)
    Similarity.appendToIvfPqIndex(emb.where(col("vec_id") % 2 === 1),
      "vec_id", "embedding", grown)
    val queries = emb.where(col("vec_id") < 4)
    def rows(path: String) = Similarity.ivfPqTopK(
        Similarity.loadIvfPqIndex(spark, path), queries, "vec_id",
        "embedding", k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .sortBy(t => (t._1, t._3)).toList
    val w = rows(whole)
    assert(w.nonEmpty && rows(grown) == w)
  }

  test("signProjection: manual recomputation, determinism, JL correlation") {
    import spark.implicits._
    import graft.expr.TextHash
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(16)(d => (((i * 11 + d * 3) % 7).toFloat - 3f))))
      .toDF("id", "vec")
    val got = vecs.select($"id",
        Similarity.signProjection($"vec", 4, seed = 42L).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // manual recomputation of row 0 with the same hash-derived signs
    val v0 = Seq.tabulate(16)(d => (((0 * 11 + d * 3) % 7).toDouble - 3))
    val manual = (0 until 4).map { i =>
      v0.zipWithIndex.map { case (v, d) =>
        v * ((TextHash.avalanche(i * 1000003L + d * 7L + 42L) & 1L) * 2L - 1L)
      }.sum
    }
    assert(got(0L).zip(manual).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // JL: projected squared distances correlate with true squared distances
    val raw = (0L until 200L).map(i =>
      Seq.tabulate(16)(d => (((i * 11 + d * 3) % 7).toDouble - 3)))
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val pairs = (0 until 50).map(k => (k, 199 - k))
    val tr = pairs.map { case (a, b) => d2(raw(a), raw(b)) }
    val pr = pairs.map { case (a, b) => d2(got(a), got(b)) / 4 }
    val corr = {
      val n = tr.length
      val (mx, my) = (tr.sum / n, pr.sum / n)
      val cov = tr.zip(pr).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sx = math.sqrt(tr.map(x => (x - mx) * (x - mx)).sum)
      val sy = math.sqrt(pr.map(y => (y - my) * (y - my)).sum)
      cov / (sx * sy)
    }
    assert(corr > 0.3, s"JL distance correlation too low: $corr")
    // empty vector → all-zero projection (not null padding); null → null
    val edge = Seq((0L, Some(Seq.empty[Float])), (1L, None))
      .toDF("id", "vec")
      .select($"id", Similarity.signProjection($"vec", 4).as("p"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(edge(0L) == Seq(0.0, 0.0, 0.0, 0.0))
    assert(edge(1L) == null)
  }

  test("pqTrain: deterministic across runs, codebook shape m×ksub×subDim") {
    import spark.implicits._
    val vecs = (0L until 60L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 7 + d * 3) % 13).toFloat))).toDF("id", "vec")
    val a = Similarity.pqTrain(vecs, "id", "vec", m = 2, subDim = 4, ksub = 3)
    val b = Similarity.pqTrain(vecs, "id", "vec", m = 2, subDim = 4, ksub = 3)
    assert(a == b)
    assert(a.length == 2 && a.forall(cb => cb.length == 3 &&
      cb.forall(_.length == 4)))
  }

  test("pqTrain == m independent kmeansFit runs (one-scan path is exact)") {
    import spark.implicits._
    val vecs = (0L until 120L).map(i =>
      (i, Seq.tabulate(8)(d => (((i * 19 + d * 7) % 23).toFloat - 11f) / 4f)))
      .toDF("id", "vec")
    val joint = Similarity.pqTrain(vecs, "id", "vec", m = 2, subDim = 4,
      ksub = 3, maxIters = 7)
    val indep = (0 until 2).map { s =>
      Similarity.kmeansFit(vecs.select(col("id").as("__id"),
          slice(col("vec"), s * 4 + 1, 4).as("__v")),
        "__id", "__v", 3, maxIters = 7).codebook
    }
    assert(joint == indep) // exact Double equality per centroid coordinate
  }
  import spark.implicits._

  // two tight, well-separated direction blobs (cosine k-means separates by
  // direction, not offset)
  private def blobs = (0 until 40).map { i =>
    val v = if (i % 2 == 0) Seq(10.0f + (i % 5) * 0.1f, 0.2f, 0.1f)
            else Seq(0.1f, 10.0f + (i % 7) * 0.1f, 0.3f)
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("kmeansFit separates direction blobs and converges") {
    val m = Similarity.kmeansFit(blobs, "vec_id", "embedding", 2, maxIters = 20)
    assert(m.iterations < 20, "should reach a fixpoint")
    val byCluster = m.assigned
      .groupBy("centroid")
      .agg(collect_set(col("vec_id") % 2).as("parities"))
      .collect().map(_.getSeq[Long](1))
    // each cluster holds one parity class exactly
    assert(byCluster.forall(_.size == 1) && byCluster.length == 2)
    // centroids point along the blob axes
    val axes = m.codebook.map(_.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes == Set(0, 1))
  }

  test("kmeansFit is bit-identical across partitionings") {
    val a = Similarity.kmeansFit(blobs.repartition(7), "vec_id", "embedding", 2)
    val b = Similarity.kmeansFit(blobs.repartition(2), "vec_id", "embedding", 2)
    assert(a.codebook == b.codebook) // exact Double equality, not approx
    assert(a.iterations == b.iterations)
  }

  test("kmeansFit update step plans with no Sort, no Window, one Exchange") {
    // the exact_sum-based update must be scan → generate → partial agg →
    // one shuffle on (cluster, dim) → final agg: the old ordered-window
    // design paid a rows×dim sort-shuffle every iteration
    val base = blobs.select(col("vec_id").as("__id"), col("embedding").as("__v"))
    val cb = Seq(Seq(10.0, 0.2, 0.1), Seq(0.1, 10.0, 0.3))
    val plan = Similarity.kmeansIterStats(base, cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"update step must not sort:\n$plan")
    assert(!plan.contains("Window"), s"update step must not window:\n$plan")
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"update step must shuffle exactly once:\n$plan")
  }

  test("empty clusters keep their previous centroid") {
    // k=3 over 2 distinct directions: one centroid is never assigned and
    // must survive unchanged (its init vector = the id-2 row)
    val two = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.01f)), (3L, Seq(0.01f, 1.0f))).toDF("vec_id", "embedding")
    val m = Similarity.kmeansFit(two, "vec_id", "embedding", 3, maxIters = 5)
    assert(m.codebook.length == 3)
    assert(m.codebook.forall(_.forall(x => !x.isNaN)))
  }

  test("k larger than corpus yields corpus-sized codebook") {
    val tiny = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.kmeansFit(tiny, "vec_id", "embedding", 5)
    assert(m.codebook.length == 2)
  }

  test("assignment matches brute-force nearest centroid on the fixture") {
    val emb = spark.read.parquet(sf("embeddings"))
    val m = Similarity.kmeansFit(emb, "vec_id", "embedding", 4, maxIters = 3)
    val got = m.assigned.select("vec_id", "centroid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cb = m.codebook.map(_.toArray)
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.zip(y).map { case (a, b) => a * b }.sum
      val nx = math.sqrt(x.map(a => a * a).sum)
      val ny = math.sqrt(y.map(a => a * a).sum)
      if (nx == 0 || ny == 0) 0.0 else d / (nx * ny)
    }
    emb.select("vec_id", "embedding").collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val best = cb.indices.maxBy(i => (cos(v, cb(i)), -i))
      assert(got(id) == best, s"vec $id")
    }
  }

  test("groupCentroids: per-dim means, dim order, nulls/empties dropped") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 2.0f, 3.0f)),
      ("a", Seq(3.0f, 6.0f, 9.0f)),
      ("b", Seq(2.0f, 0.0f, -2.0f)),
      ("b", Seq.empty[Float]),            // contributes nothing
      (null.asInstanceOf[String], Seq(9.0f, 9.0f, 9.0f)),
      ("c", null.asInstanceOf[Seq[Float]])).toDF("g", "v")
    val got = Similarity.groupCentroids(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1).toSeq, r.getLong(2))).toMap
    assert(got == Map(
      "a" -> (Seq(2.0, 4.0, 6.0), 2L),
      "b" -> (Seq(2.0, 0.0, -2.0), 1L)))
  }

  test("groupCentroids: bit-identical across partitionings") {
    import spark.implicits._
    val rows = (0 until 500).map(i =>
      (s"g${i % 7}", Seq.tabulate(16)(d => (math.sin(i * 16 + d) * 1e3).toFloat)))
    def run(parts: Int) = Similarity.groupCentroids(
        rows.toDF("g", "v").repartition(parts), col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    val one = run(1); val many = run(17)
    assert(one.keySet == many.keySet)
    one.foreach { case (g, c) =>
      assert(c.zip(many(g)).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y) }, s"group $g")
    }
  }

  test("centroidCosines: hand-checked pairs, a<b orientation, self-sim 1") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(1.0f, 0.0f)),   // centroid (1,0)
      ("b", Seq(0.0f, 2.0f)),                            // centroid (0,2)
      ("c", Seq(2.0f, 0.0f))                             // centroid (2,0)
    ).toDF("g", "v")
    val got = Similarity.centroidCosines(df, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got(("a", "b")) == 0.0)       // orthogonal
    assert(got(("a", "c")) == 1.0)       // parallel
    assert(got(("b", "c")) == 0.0)
  }

  test("centroidShift: hand-checked cosine/norms, self-shift is 1.0") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),     // even: centroid (1,0)
      (1L, Seq(0.0f, 3.0f)), (3L, Seq(0.0f, 1.0f))      // odd: centroid (0,2)
    ).toDF("id", "v")
    val r = Similarity.centroidShift(df, col("v"), col("id") % 2 === 0)
      .collect()(0)
    assert(r.getDouble(0) == 0.0)                       // orthogonal centroids
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 2.0)
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)
    // identical slices → cosine exactly 1
    val same = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(1.0f, 2.0f)))
      .toDF("id", "v")
    val s = Similarity.centroidShift(same, col("v"), col("id") % 2 === 0)
      .collect()(0)
    assert(s.getDouble(0) == 1.0)
  }

  test("IVF-PQ index save/load: searches are identical, layout prunes by cell") {
    import spark.implicits._
    val vecs = (0L until 200L).map(i =>
      (i, Seq.tabulate(8)(d => (((i * 13 + d * 5) % 17).toFloat - 8f) / 8f)))
      .toDF("id", "vec")
    val idx = Similarity.ivfPqBuild(vecs, "id", "vec",
      nCenters = 4, m = 2, subDim = 4, ksub = 4, maxIters = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    Similarity.saveIvfPqIndex(idx, dir)
    val loaded = Similarity.loadIvfPqIndex(spark, dir)
    assert(loaded.centroids == idx.centroids)
    assert(loaded.codebooks == idx.codebooks)
    assert(loaded.subDim == idx.subDim)
    // cell-partitioned directories on disk (the probe-pruning layout)
    val cellDirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("centroid="))
    assert(cellDirs.nonEmpty)
    // searches over the reloaded index are row-for-row identical
    val q = vecs.where($"id" < 3)
    val a = Similarity.ivfPqTopK(idx, q, "id", "vec", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.ivfPqTopK(loaded, q, "id", "vec", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    val ar = Similarity.ivfPqTopKRefined(idx, vecs, q, "id", "vec",
      k = 3, rerank = 10, nProbe = 4).collect().map(_.toSeq).toSeq
    val br = Similarity.ivfPqTopKRefined(loaded, vecs, q, "id", "vec",
      k = 3, rerank = 10, nProbe = 4).collect().map(_.toSeq).toSeq
    assert(ar == br)
  }

  test("centroidCosines on the embeddings fixture: k*(k-1)/2 pairs in [-1,1]") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Similarity.centroidCosines(emb, col("label"), col("embedding"))
      .collect()
    val k = emb.select("label").distinct().count()
    assert(rows.length == (k * (k - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
      assert(r.getInt(0) < r.getInt(1))
    }
  }
}
