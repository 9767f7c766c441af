package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}
import org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned
import org.apache.spark.sql.graftshim.{toColumn, toExpr}

/** Distributed document deduplication for training-data pipelines.
  *
  * Every method is a pure DataFrame→DataFrame transformation whose candidate
  * generation is a deterministic function of the row (hash-based, no RNG), so
  * results are stable across partitionings — the property that lets the same
  * job run identically on 500 rows or 100 TB.
  *
  * Scale design:
  *  - exact dedup is one hash-keyed groupBy (map-side partial aggregation,
  *    single shuffle on the 64-bit content hash);
  *  - near-dup candidate generation explodes each doc into `bands` small
  *    (band, key) rows and shuffles those — never the full text — then joins
  *    text back by id only for the surviving candidate pairs;
  *  - all joins are equi-joins on hash keys (shuffle-hash/sort-merge
  *    friendly, AQE-skew-splittable); nothing is O(n²).
  */
object Dedup {

  /** Exact dedup on a normalized text hash: keeps, per duplicate group, the
    * row with the smallest `idCol`. Output schema = input schema. */
  def exact(df: DataFrame, idCol: String, textCol: String,
      normalize: Boolean = true): DataFrame = {
    // group on the normalized TEXT, not its 64-bit hash: at multi-billion-doc
    // scale hash-only grouping would silently delete colliding distinct docs.
    // The shuffle already carries the full row, so keying by text costs only
    // the normalized copy.
    val key = if (normalize) normalized(col(textCol)) else col(textCol)
    val cols = df.columns
    df.groupBy(key.as("__k"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__r"))
      .select(cols.map(c => col(s"__r.$c")): _*)
  }

  /** Whitespace/case normalization used by exact dedup and content keys. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Paragraph-level exact dedup across the whole corpus (boilerplate
    * removal, the CCNet/RefinedWeb trick): split every document on `sep`,
    * keep each distinct paragraph only at its FIRST occurrence — smallest
    * (id, position) — and reassemble documents in original paragraph
    * order. Repeated boilerplate (headers, footers, nav chrome) survives
    * in exactly one document; fully-boilerplate documents come back empty
    * rather than disappearing.
    *
    * Scale shape: one explode (rows = paragraphs), one shuffle keyed by
    * paragraph text for the first-occurrence window, one group-back by id.
    * Paragraphs — not whole documents — ride the shuffle, so the transfer
    * is the same order as the corpus itself. Output:
    * (idCol, clean_text, n_kept, n_dropped). */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    val reserved = Seq("__did", "__idx", "__para", "__rn")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val exploded = df.select(col(idCol).as("__did"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("__idx", "__para")))
    val w = Window.partitionBy(col("__para"))
      .orderBy(col("__did"), col("__idx"))
    exploded
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("__did").as(idCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("__rn") === 1,
            struct(col("__idx").as("i"), col("__para").as("p"))))),
          s => s.getField("p"))).as("clean_text"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__rn") =!= 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** 64-bit content key: xxhash64 of (optionally whitespace/case-normalized)
    * text — the exact-dedup shuffle key. */
  def contentKey(text: Column, normalize: Boolean = true): Column =
    xxhash64(if (normalize) normalized(text) else text)

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle → minhash signature (numHashes) → `bands` bands of
    * numHashes/bands rows each → candidate pairs that collide in ≥1 band →
    * exact n-gram Jaccard verification ≥ `threshold`.
    *
    * Returns (idA, idB, jaccard) with idA < idB, one row per pair.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.7, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = gf.minhash_signature(col(textCol), shingleN, numHashes, seed)
    // (id, band, bandKey): hash of the band's signature slice; only these
    // small rows shuffle for candidate generation
    val banded = df
      .select(col(idCol).as("__id"), sig.as("__sig"))
      .select(col("__id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("__sig"), b * r + lit(1), lit(r))))))
      .toDF("__id", "__band", "__key")
    val a = banded.select(col("__band"), col("__key"), col("__id").as("idA"))
    val b = banded.select(col("__band"), col("__key"), col("__id").as("idB"))
    // Self-join as a shuffle join, not broadcast: both sides canonicalize to
    // the same subtree, so ReuseExchange computes + shuffles the signatures
    // ONCE. A broadcast join would re-evaluate the minhash on both sides —
    // and at corpus scale the banded table isn't broadcastable anyway.
    val cand = a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"), Seq("__band", "__key"))
      .where(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
    verifyJaccard(df, cand, idCol, textCol, shingleN, threshold)
  }

  /** Cross-corpus MinHash near-duplicate matching: pairs (idA from `left`,
    * idB from `right`) with verified Jaccard ≥ threshold — the incremental
    * ("delta") dedup shape: match a NEW shard against the EXISTING corpus
    * without comparing the corpus to itself. Same banded candidate
    * generation as [[minhashPairs]]; the band join crosses the two frames,
    * so candidate volume scales with shard×corpus collisions, never
    * corpus². Returns (idA, idB, jaccard) — one row per matched pair; drop
    * `left` rows that appear as idA to dedup the new shard. */
  def minhashPairsAcross(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, numHashes: Int = 128,
      bands: Int = 32, threshold: Double = 0.7, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    def banded(df: DataFrame, as: String): DataFrame = {
      val sig = gf.minhash_signature(col(textCol), shingleN, numHashes, seed)
      df.select(col(idCol).as("__id"), sig.as("__sig"))
        .select(col("__id"), posexplode(
          transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(b, slice(col("__sig"), b * r + lit(1), lit(r))))))
        .toDF(as, "__band", "__key")
    }
    val cand = banded(left, "idA").hint("SHUFFLE_HASH")
      .join(banded(right, "idB").hint("SHUFFLE_HASH"), Seq("__band", "__key"))
      .select("idA", "idB").distinct()
    val ta = left.select(col(idCol).as("idA"), col(textCol).as("__ta"))
    val tb = right.select(col(idCol).as("idB"), col(textCol).as("__tb"))
    cand.join(ta, Seq("idA")).join(tb, Seq("idB"))
      .select(col("idA"), col("idB"),
        gf.ngram_jaccard(col("__ta"), col("__tb"), shingleN).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  // --- persisted MinHash index (build-once / dedup-many) -------------------

  /** Build a PERSISTED MinHash dedup index over `df` — the incremental-
    * ingestion decoupling (q149's train-once/search-many pattern for the
    * dedup side): index the existing corpus ONCE, then dedup every new
    * crawl increment against it with [[pairsAgainstIndex]] without
    * re-signaturing a byte of the indexed corpus.
    *
    * Layout under `dir`:
    *  - `bands/`    (band INT, key LONG, id LONG) — the LSH candidate
    *    join surface, (bands × nDocs) rows of 20 bytes;
    *  - `shingles/` (id LONG, sh ARRAY<LONG>) — each doc's sorted
    *    distinct shingle-hash set ([[graft.api.functions.shingle_hashes]]
    *    — the EXACT sets `ngram_jaccard` compares, so index-side
    *    verification is bit-identical to text-side verification);
    *  - `meta/`     one row (shingle_n, num_hashes, bands, seed) — query
    *    time re-derives signatures from the STORED geometry, so a
    *    mismatched caller cannot silently produce an incompatible join.
    *
    * One corpus pass; both tables partition on nothing special — the
    * band join repartitions by (band, key) at query time anyway. */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String,
      dir: String, shingleN: Int = 3, numHashes: Int = 128,
      bands: Int = 32, seed: Long = 42L): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = gf.minhash_signature(col(textCol), shingleN, numHashes, seed)
    df.select(col(idCol).as("id"), sig.as("__sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("__sig"), b * r + lit(1), lit(r))))))
      .toDF("id", "band", "key")
      .write.mode("overwrite").parquet(s"$dir/bands")
    df.select(col(idCol).as("id"),
        gf.shingle_hashes(col(textCol), shingleN).as("sh"))
      .write.mode("overwrite").parquet(s"$dir/shingles")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((shingleN, numHashes, bands, seed))
      .toDF("shingle_n", "num_hashes", "bands", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Append a new shard to a persisted [[buildMinhashIndex]] layout —
    * the index grows with the corpus, the production lifecycle of a
    * dedup index (daily crawls arrive; re-signaturing the whole history
    * per shard would be O(corpus) per day instead of O(shard)).
    * Signatures come from the STORED geometry (never caller guesses, the
    * [[pairsAgainstIndex]] contract), and new rows land as additional
    * parquet files in `bands/` and `shingles/` — readers union files, so
    * an appended index is indistinguishable from one built whole
    * (gate-pinned identical-output, q225). Ids must be globally unique
    * across the original build and every append; the caller owns that
    * (same as any keyed layout). NOT crash-atomic the way the shard
    * sinks are: parquet append is two directory writes — rerun the
    * append after a failure rather than reading a half-appended layout. */
  def appendToMinhashIndex(df: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.read.parquet(s"$dir/meta").head
    val shingleN = meta.getAs[Int]("shingle_n")
    val numHashes = meta.getAs[Int]("num_hashes")
    val bands = meta.getAs[Int]("bands")
    val seed = meta.getAs[Long]("seed")
    val r = numHashes / bands
    val sig = gf.minhash_signature(col(textCol), shingleN, numHashes, seed)
    df.select(col(idCol).as("id"), sig.as("__sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("__sig"), b * r + lit(1), lit(r))))))
      .toDF("id", "band", "key")
      .write.mode("append").parquet(s"$dir/bands")
    df.select(col(idCol).as("id"),
        gf.shingle_hashes(col(textCol), shingleN).as("sh"))
      .write.mode("append").parquet(s"$dir/shingles")
  }

  /** Match a NEW shard against a persisted [[buildMinhashIndex]] layout:
    * returns (idA = new-shard id, idB = indexed id, jaccard) with exact
    * verified Jaccard ≥ threshold — row-identical to
    * [[minhashPairsAcross]](newDf, indexedCorpus, …) at the index's
    * geometry, WITHOUT touching the indexed corpus' text. The new shard
    * is signatured once; candidate volume is shard×index band
    * collisions; stored shingle sets ship only for candidate idBs
    * (semi-join pruned before the verify join). */
  def pairsAgainstIndex(newDf: DataFrame, idCol: String, textCol: String,
      dir: String, threshold: Double): DataFrame = {
    val spark = newDf.sparkSession
    val meta = spark.read.parquet(s"$dir/meta").head
    val shingleN = meta.getAs[Int]("shingle_n")
    val numHashes = meta.getAs[Int]("num_hashes")
    val bands = meta.getAs[Int]("bands")
    val seed = meta.getAs[Long]("seed")
    val r = numHashes / bands
    val sig = gf.minhash_signature(col(textCol), shingleN, numHashes, seed)
    val qb = newDf.select(col(idCol).as("__id"), sig.as("__sig"))
      .select(col("__id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("__sig"), b * r + lit(1), lit(r))))))
      .toDF("idA", "__band", "__key")
    val ib = spark.read.parquet(s"$dir/bands")
      .select(col("id").as("idB"), col("band").as("__band"),
        col("key").as("__key"))
    val cand = qb.hint("SHUFFLE_HASH")
      .join(ib.hint("SHUFFLE_HASH"), Seq("__band", "__key"))
      .select("idA", "idB").distinct()
    val qs = newDf.select(col(idCol).as("idA"),
      gf.shingle_hashes(col(textCol), shingleN).as("__sa"))
    val is = spark.read.parquet(s"$dir/shingles")
      .select(col("id").as("idB"), col("sh").as("__sb"))
    // same arithmetic as TextKernels.ngramJaccard over the same hash
    // sets, including the both-empty → 1.0 convention
    cand.join(qs, Seq("idA")).join(is, Seq("idB"))
      .withColumn("__i",
        size(array_intersect(col("__sa"), col("__sb"))))
      .select(col("idA"), col("idB"),
        when(size(col("__sa")) === 0 && size(col("__sb")) === 0, lit(1.0))
          .otherwise(col("__i") /
            (size(col("__sa")) + size(col("__sb")) - col("__i")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Join candidate (idA, idB) pairs back to their texts and keep pairs with
    * exact n-gram Jaccard ≥ threshold. */
  private def verifyJaccard(df: DataFrame, cand: DataFrame, idCol: String,
      textCol: String, shingleN: Int, threshold: Double): DataFrame = {
    val txt = df.select(col(idCol).as("__jid"), col(textCol).as("__jtxt"))
    cand
      .join(txt.withColumnRenamed("__jid", "idA").withColumnRenamed("__jtxt", "__ta"), Seq("idA"))
      .join(txt.withColumnRenamed("__jid", "idB").withColumnRenamed("__jtxt", "__tb"), Seq("idB"))
      .select(col("idA"), col("idB"),
        gf.ngram_jaccard(col("__ta"), col("__tb"), shingleN).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact-span (shared substring) near-duplicate pairs: documents sharing
    * at least `minShared` distinct contiguous runs of `windowTokens` tokens
    * (Lee et al.'s exact-substring dedup signal, at token granularity).
    *
    * Candidate generation explodes each doc into its distinct span hashes
    * (longs — never text) and equi-joins on the span. Spans occurring in
    * more than `maxDocsPerSpan` documents are dropped first: those are
    * corpus boilerplate whose pair blow-up is quadratic, and the count pass
    * that removes them is one cheap aggregation on the already-shuffled key.
    * Both self-join sides read the same filtered subtree (SHUFFLE_HASH), so
    * AQE's ReuseExchange computes and shuffles the spans once.
    *
    * Returns (idA, idB, shared_spans) with idA < idB. */
  def spanPairs(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 16, minShared: Long = 1,
      maxDocsPerSpan: Long = 1000): DataFrame = {
    val spans = df.select(col(idCol).as("__id"),
      explode(gf.shingle_hashes(col(textCol), windowTokens)).as("__span"))
    val keep = spans.groupBy("__span").agg(count(lit(1)).as("__n"))
      .where(col("__n").between(2L, maxDocsPerSpan))
      .select("__span")
    val filtered = spans.join(keep, Seq("__span"))
    val a = filtered.select(col("__span"), col("__id").as("idA"))
    val b = filtered.select(col("__span"), col("__id").as("idB"))
    a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"), Seq("__span"))
      .where(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("shared_spans"))
      .where(col("shared_spans") >= minShared)
  }

  /** Maximal shared token RUNS: extends [[spanPairs]]'s fixed-length signal
    * to full-extent repeats (the report Lee et al.'s exact-substring dedup
    * actually wants — "docs A and B share THIS 240-token block", not "233
    * overlapping 8-token windows").
    *
    * Positional span matches (idA, idB, posA, posB) chain along the
    * (posA − posB) DIAGONAL: consecutive positions on one diagonal are one
    * contiguous repeat, so maximal runs fall out of the classic
    * gaps-and-islands trick (posA − row_number() per diagonal) with no
    * iteration. Returns (idA, idB, start_a, start_b, run_tokens), idA < idB,
    * positions 0-based in TOKENS, run_tokens = token length of the maximal
    * run (≥ `windowTokens`); one row per maximal run, so a repeat that
    * occurs twice in B yields two runs on different diagonals.
    *
    * Scale shape: same as [[spanPairs]] — span hashes (longs, never text)
    * shuffle once, boilerplate spans (> `maxDocsPerSpan` docs) drop before
    * the self-join, both sides reuse one exchange — plus one window over
    * (pair, diagonal), whose input is only the MATCHED positions (bounded by
    * the pair-filtered span collisions, not the corpus). Note: dropping a
    * boilerplate span can split a surviving run in two — at the guard's
    * intended setting those spans are corpus chrome, not pair signal. */
  def sharedRuns(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 16, maxDocsPerSpan: Long = 1000,
      minRunTokens: Int = 0): DataFrame = {
    // positional spans via the codegen'd kernel (shingle_hashes dedupes +
    // sorts, which destroys positions; a string-building transform/slice/
    // concat_ws formulation measured ~6× slower — allocation per window).
    // Only (id, pos, long) rows ever shuffle.
    val spans = df.select(col(idCol).as("__id"),
      posexplode(gf.shingle_hashes_pos(col(textCol), windowTokens))
        .as(Seq("__pos", "__span")))
    val keep = spans.groupBy("__span").agg(count(lit(1)).as("__n"))
      .where(col("__n").between(2L, maxDocsPerSpan))
      .select("__span")
    val filtered = spans.join(keep, Seq("__span"))
    val a = filtered.select(col("__span"), col("__id").as("idA"),
      col("__pos").as("__pa"))
    val b = filtered.select(col("__span"), col("__id").as("idB"),
      col("__pos").as("__pb"))
    val matches = a.hint("SHUFFLE_HASH")
      .join(b.hint("SHUFFLE_HASH"), Seq("__span"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), col("__pa"), col("__pb"),
        (col("__pa") - col("__pb")).as("__diag"))
    val w = Window.partitionBy("idA", "idB", "__diag").orderBy("__pa")
    matches
      .withColumn("__isl", col("__pa") - row_number().over(w))
      .groupBy("idA", "idB", "__diag", "__isl")
      .agg(min("__pa").as("start_a"), min("__pb").as("start_b"),
        (max("__pa") - min("__pa") + lit(windowTokens)).as("run_tokens"))
      .where(col("run_tokens") >= math.max(minRunTokens, windowTokens))
      .select("idA", "idB", "start_a", "start_b", "run_tokens")
  }

  /** Remove shared runs at their FULL extent, keeping the first (smallest
    * id) occurrence — Lee et al.'s exact-substring dedup as a corpus
    * transformation: every maximal shared run found by [[sharedRuns]] is
    * deleted from the LARGER id of each pair (union of covered token
    * positions, so overlapping runs from different partners compose), and
    * the survivor text reassembles in original token order. Documents whose
    * every token was shared come back EMPTY rather than disappearing (same
    * contract as [[dedupParagraphs]]). Output: (idCol, clean_text, n_kept,
    * n_dropped); text is whitespace-normalized by the tokenization.
    *
    * Scale shape: [[sharedRuns]]'s cost plus one posexplode of the corpus
    * tokens, an anti-join on (id, position) against the covered set (which
    * is bounded by the DUPLICATED mass, not the corpus), and one group-back
    * by id. */
  def removeSharedRuns(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 16, maxDocsPerSpan: Long = 1000,
      minRunTokens: Int = 0): DataFrame = {
    val runs = sharedRuns(df, idCol, textCol, windowTokens, maxDocsPerSpan,
      minRunTokens)
    val covered = runs.select(col("idB").as("__id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("run_tokens") - 1)).as("__pos"))
      .distinct()
    // split(trim(""), "\s+") yields a single EMPTY token — dropping
    // zero-length tokens keeps empty/whitespace-only docs at n_kept=0,
    // consistent with shingle_hashes_pos's zero-token view of the same
    // input. Non-empty trimmed text never produces empty tokens, so
    // positions are undisturbed for every real document.
    val toks = df.select(col(idCol).as("__id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("__pos", "__tok")))
      .where(length(col("__tok")) > 0)
    val kept = toks.join(covered, Seq("__id", "__pos"), "left_anti")
      .groupBy("__id")
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__pos").as("i"),
            col("__tok").as("t")))),
          s => s.getField("t"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    val totals = toks.groupBy("__id").agg(count(lit(1)).as("__total"))
    df.select(col(idCol))
      .join(kept.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .join(totals.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("__total"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }

  /** Byte-level content-defined-chunking (CDC) duplicate pairs: documents
    * sharing ≥ `minShared` distinct Rabin-CDC chunk hashes
    * ([[graft.expr.TextKernels.cdcChunkHashes]]; expected chunk ≈ 2^bits
    * bytes). Chunk boundaries are content-local, so an insertion
    * re-synchronizes within one 16-byte window and every untouched chunk
    * still matches — the dedup signal for content WITHOUT token structure
    * (code, CJK, whitespace-free streams), where [[spanPairs]]'s token
    * windows cannot exist.
    *
    * Same scale shape as [[spanPairs]]: per-doc DISTINCT chunk hashes
    * (longs, never text) shuffle once; chunks in more than
    * `maxDocsPerChunk` docs are corpus boilerplate and drop before the
    * self-join; both sides reuse one exchange. Returns
    * (idA, idB, shared_chunks) with idA < idB. */
  def cdcPairs(df: DataFrame, idCol: String, textCol: String, bits: Int = 6,
      minShared: Long = 1, maxDocsPerChunk: Long = 1000): DataFrame = {
    val chunks = df.select(col(idCol).as("__id"),
        explode(gf.cdc_chunk_hashes(col(textCol), bits)).as("__chunk"))
      .distinct()
    val keep = chunks.groupBy("__chunk").agg(count(lit(1)).as("__n"))
      .where(col("__n").between(2L, maxDocsPerChunk))
      .select("__chunk")
    val filtered = chunks.join(keep, Seq("__chunk"))
    val a = filtered.select(col("__chunk"), col("__id").as("idA"))
    val b = filtered.select(col("__chunk"), col("__id").as("idB"))
    a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"), Seq("__chunk"))
      .where(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("shared_chunks"))
      .where(col("shared_chunks") >= minShared)
  }

  /** SimHash near-duplicate pairs: 64-bit simhash, split into `chunks`
    * equal bit-chunks; by pigeonhole, any pair within hamming distance
    * `chunks − 1` shares ≥1 exact chunk, so candidates are equi-join
    * collisions on (chunk_index, chunk_bits); verified with
    * bit_count(a ^ b) ≤ maxHamming (exact, codegen'd).
    *
    * Returns (idA, idB, hamming). Guaranteed-complete for
    * maxHamming ≤ chunks − 1.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, maxHamming: Int = 3, chunks: Int = 4): DataFrame =
    hammingPairs(df.select(col(idCol).as("__id"),
        gf.simhash64(col(textCol), shingleN).as("__sh")),
      "__id", "__sh", maxHamming, chunks)

  /** Near-duplicate pairs among arbitrary 64-bit fingerprints — the
    * banding+verify core of [[simhashPairs]], reusable for ANY 64-bit
    * content signature: image perceptual hashes
    * ([[graft.media.Media.imagePhashes]]), audio fingerprints
    * ([[graft.media.Media.audioFingerprints]]), doc fingerprints. Rows
    * with a NULL fingerprint are dropped (undecodable media). Same scale
    * shape: only (chunk, bits, id, fp) rows shuffle, never payloads.
    *
    * Returns (idA, idB, hamming); complete for maxHamming ≤ chunks − 1. */
  /** w-bit low mask that survives w = 64 (chunks = 1): JVM shifts are
    * mod-64, so `(1L << 64) - 1` is 0 — every fingerprint would mask to
    * bucket 0 and the banding join would silently become a full cross
    * join. chunks = 1 is legitimate (exact-fingerprint join). */
  private def chunkMask(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1

  def hammingPairs(df: DataFrame, idCol: String, bitsCol: String,
      maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    require(chunks >= 1 && 64 % chunks == 0, "chunks must divide 64")
    require(maxHamming <= chunks - 1,
      s"chunk banding only guarantees recall for hamming <= ${chunks - 1}")
    val w = 64 / chunks
    val sh = df.select(col(idCol).as("__id"),
        col(bitsCol).cast("long").as("__sh"))
      .where(col("__sh").isNotNull)
    val banded = sh.select(col("__id"), col("__sh"), posexplode(
      transform(sequence(lit(0), lit(chunks - 1)),
        c => toColumn(ShiftRightUnsigned(toExpr(col("__sh")),
          toExpr((c * w).cast("int")))).bitwiseAND(lit(chunkMask(w))))))
      .toDF("__id", "__sh", "__chunk", "__bits")
    val a = banded.select(col("__chunk"), col("__bits"),
      col("__id").as("idA"), col("__sh").as("__shA"))
    val b = banded.select(col("__chunk"), col("__bits"),
      col("__id").as("idB"), col("__sh").as("__shB"))
    // shuffle join so ReuseExchange evaluates the simhash subtree once
    // (see minhashPairs); the chunk table is corpus-sized at scale
    a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"), Seq("__chunk", "__bits"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("__shA").bitwiseXOR(col("__shB"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[hammingPairs]] with an ADAPTIVE defense against bucket blowup.
    *
    * Single-level chunk banding generates ~Σ_b n_b² candidates; on
    * adversarial inputs (uniform random fingerprints at 10M+ rows, or a
    * few very hot buckets) that reaches billions while the verified
    * output stays tiny — measured 78 s at n=10M/chunks=4 (SURVEY §8.2).
    * This variant first runs a CHEAP estimate (one count aggregation over
    * the banded keys — 12-byte rows, no pair materialization); if the
    * estimated candidate count stays within `candidateBudget` it runs the
    * plain single-level join, otherwise it switches to TWO-LEVEL banding
    * (multi-index hashing, Norouzi et al. 2012): a candidate must share a
    * chunk (pigeonhole on the whole word) AND one of `maxHamming + 1`
    * sub-chunks of the remaining 64−w bits (pigeonhole on the rest, which
    * still holds ≤ maxHamming differing bits when the chunk matches
    * exactly) — join keys grow from w to ~w + (64−w)/(maxHamming+1) bits,
    * shrinking uniform-bucket sizes by ~2^12 at the default geometry for
    * (chunks·(maxHamming+1))× key rows. Same recall contract
    * (complete for maxHamming ≤ chunks − 1), identical output rows.
    *
    * Measured on the uniform adversary (local[32], default geometry):
    * n=10M → est 3.1e9 candidates, single-level 82 s vs two-level 160 s
    * (tier switch correctly stays single); n=20M → est 1.2e10,
    * single-level DIES (shuffled-hash build OOM) while two-level
    * completes in 187 s. The default budget of 4e9 sits between those
    * operating points: the two-level tier is the survival path for
    * candidate blowups, not a latency optimization.
    *
    * The (id, fingerprint) projection is localCheckpointed first so the
    * estimate pass cannot re-run an expensive upstream (e.g. simhash over
    * corpus text) a second time — 16 bytes/row, the narrowest frame in
    * the pipeline. */
  def hammingPairsAdaptive(df: DataFrame, idCol: String, bitsCol: String,
      maxHamming: Int = 3, chunks: Int = 4,
      candidateBudget: Long = 4000000000L): DataFrame = {
    require(chunks >= 1 && 64 % chunks == 0, "chunks must divide 64")
    require(maxHamming <= chunks - 1,
      s"chunk banding only guarantees recall for hamming <= ${chunks - 1}")
    val w = 64 / chunks
    val sh = df.select(col(idCol).as("__id"),
        col(bitsCol).cast("long").as("__sh"))
      .where(col("__sh").isNotNull)
      .localCheckpoint()
    val banded1 = sh.select(col("__id"), col("__sh"), posexplode(
      transform(sequence(lit(0), lit(chunks - 1)),
        c => toColumn(ShiftRightUnsigned(toExpr(col("__sh")),
          toExpr((c * w).cast("int")))).bitwiseAND(lit(chunkMask(w))))))
      .toDF("__id", "__sh", "__chunk", "__bits")
    val est = banded1.groupBy("__chunk", "__bits")
      .agg(count(lit(1)).cast("double").as("__n"))
      .agg(coalesce(sum(col("__n") * (col("__n") - 1) / 2), lit(0.0)))
      .head.getDouble(0)
    if (est <= candidateBudget.toDouble)
      return hammingPairs(sh, "__id", "__sh", maxHamming, chunks)
    // two-level keys: (chunk, chunk bits, sub, sub bits of the REMAINING
    // 64−w bits). Sub-chunk widths need not be equal (pigeonhole holds
    // for any partition into maxHamming+1 parts); the first r % k2 subs
    // take one extra bit.
    val k2 = maxHamming + 1
    val r = 64 - w
    val widths = Array.tabulate(k2)(s => r / k2 + (if (s < r % k2) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val maxSubW = if (widths.isEmpty) 0 else widths.max
    // each (chunk, chunk bits, sub, sub bits) key packs into ONE long —
    // (c·k2+s) · 2^w+maxSubW + cb · 2^maxSubW + sb fits in ≤ ~w+16 bits —
    // so the self-join keys on a primitive instead of a struct
    val keys = (0 until chunks).flatMap { c =>
      // bits of __sh with chunk c excised, packed into the low 64−w bits
      // (JVM shifts are mod-64: the top chunk's ">>> 64" would be a
      // no-op, so it gets an explicit zero hi part)
      val hi = if ((c + 1) * w == 64) lit(0L)
        else toColumn(ShiftRightUnsigned(toExpr(col("__sh")),
          toExpr(lit((c + 1) * w).cast("int"))))
          .multiply(lit(1L << (c * w)))
      val lo = if (c == 0) lit(0L)
        else col("__sh").bitwiseAND(lit((1L << (c * w)) - 1))
      val rem = hi.bitwiseOR(lo)
      val cb = toColumn(ShiftRightUnsigned(toExpr(col("__sh")),
        toExpr(lit(c * w).cast("int"))))
        .bitwiseAND(lit(chunkMask(w)))
      (0 until k2).map { s =>
        val sb = toColumn(ShiftRightUnsigned(toExpr(rem),
          toExpr(lit(offsets(s)).cast("int"))))
          .bitwiseAND(lit(if (widths(s) == 0) 0L else (1L << widths(s)) - 1))
        lit((c.toLong * k2 + s) << (w + maxSubW))
          .plus(cb.multiply(lit(if (maxSubW == 0) 1L else 1L << maxSubW)))
          .plus(sb)
      }
    }
    val banded2 = sh.select(col("__id"), col("__sh"),
      explode(array(keys: _*)).as("__k"))
    val a = banded2.select(col("__k"), col("__id").as("idA"),
      col("__sh").as("__shA"))
    val b = banded2.select(col("__k"), col("__id").as("idB"),
      col("__sh").as("__shB"))
    // sort-merge, not shuffled-hash: the key table is chunks·k2 rows per
    // input row (16× at the default geometry) and a per-partition hash
    // map over it OOMs exactly on the adversarial inputs this tier is
    // for; SMJ streams both sorted sides with O(1) memory
    a.hint("MERGE").join(b.hint("MERGE"), Seq("__k"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("__shA").bitwiseXOR(col("__shB"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Group near-duplicate pairs into clusters: connected components over the
    * pair graph. Returns (id, component) where component = min id reachable;
    * singletons absent from `pairs` keep their own id via the optional
    * `allIds` frame.
    *
    * Two tiers, same contract (the broadcast-join decision applied to
    * graphs): the edge set that survives near-dup verification is usually
    * minuscule next to the corpus — when at most `localEdgeThreshold` edges
    * exist they are collected and solved with driver-side union-find in one
    * pass; larger graphs run alternating neighbor-min propagation + pointer
    * jumping (Kiveris et al. style) — two hash joins + a min-agg per round,
    * O(log n) rounds, all shuffles on the id key.
    *
    * This is the standard last step of corpus dedup at scale: pick one
    * canonical doc per component. */
  def components(pairs: DataFrame, maxIterations: Int = 20,
      allIds: Option[DataFrame] = None,
      localEdgeThreshold: Int = 1 << 20): DataFrame = {
    // binary ids have no driver-side value equality/ordering that matches
    // Spark's (arrays hash by identity; min is bytewise) — keep them on the
    // distributed path where Spark's own semantics apply
    val localCapable = pairs.schema("idA").dataType match {
      case org.apache.spark.sql.types.BinaryType => false
      case _ => true
    }
    if (!localCapable) return componentsLoop(pairs, maxIterations, allIds)
    // materialize the edge list once: the probe below would otherwise run
    // the (expensive) candidate-generation lineage to completion and throw
    // the rows away whenever the graph turns out large, and the loop tier
    // re-reads the edges every iteration anyway
    val edgeList = pairs.select(col("idA"), col("idB")).localCheckpoint()
    val probe = edgeList.limit(localEdgeThreshold + 1).collect()
    val result =
      if (probe.length <= localEdgeThreshold)
        componentsLocal(edgeList, probe, allIds)
      else componentsLoop(edgeList, maxIterations, allIds)
    // both tiers are done with the edge snapshot by now (local: labels built
    // driver-side; loop: final labels checkpoint truncates lineage) — free
    // its blocks instead of waiting for driver GC
    CheckpointUtil.freeCheckpoint(edgeList)
    result
  }

  /** One representative per near-dup cluster chosen by SCORE (quality,
    * length, freshness…) rather than the min id — the curation policy most
    * pipelines actually want ("keep the best copy, drop the rest").
    * `clusters` is the (id, component) frame from [[components]]; ties
    * break toward the SMALLEST id under Spark's ordering for the id's own
    * type (numeric, string, binary, …): the winner is min_by over
    * (−score, id), so the id never needs negating — a `* -1` tie-break
    * would silently cast string ids to double → null → a nondeterministic
    * representative. Scores must be numeric (that's what −score needs).
    * One shuffle on the component key; the winning row is selected inside
    * the aggregate, so only one row per cluster survives the exchange. */
  def keepBest(df: DataFrame, idCol: String, clusters: DataFrame,
      scoreCol: String): DataFrame = {
    require(!df.columns.exists(Set("component", "__r")),
      "input may not contain reserved columns component, __r")
    require(df.schema(scoreCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"scoreCol '$scoreCol' must be numeric, got ${df.schema(scoreCol).dataType}")
    val cols = df.columns
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol))
      .groupBy("component")
      .agg(min_by(struct((cols :+ "component").map(col): _*),
        struct((col(scoreCol) * -1).as("__neg_score"), col(idCol).as("__id")))
        .as("__r"))
      .select((cols :+ "component").map(c => col(s"__r.$c")): _*)
  }

  /** Driver-side union-find over an already-collected edge list; labels ship
    * back as a (broadcast-sized) frame. Identical (id, min-reachable-id)
    * contract as [[componentsLoop]]. */
  private def componentsLocal(pairs: DataFrame,
      edges: Array[org.apache.spark.sql.Row],
      allIds: Option[DataFrame]): DataFrame = {
    val spark = pairs.sparkSession
    val parent = new java.util.HashMap[Any, Any]()
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.get(x)
      while (p != x) { // path halving
        val gp = parent.get(p)
        parent.put(x, gp)
        x = gp
        p = parent.get(x)
      }
      x
    }
    edges.foreach { r =>
      val a = r.get(0); val b = r.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(ra, rb)
    }
    // component = MIN member id under SPARK's ordering: strings compare as
    // UTF-8 bytes (JVM String.compareTo is UTF-16 order, which disagrees on
    // supplementary-plane characters — the canonical id must not depend on
    // which tier ran)
    val lt: (Any, Any) => Boolean =
      pairs.schema("idA").dataType match {
        case org.apache.spark.sql.types.StringType => (a, b) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(
              b.asInstanceOf[String])) < 0
        case _ => (a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      }
    val minOfRoot = new java.util.HashMap[Any, Any]()
    parent.keySet().forEach { n =>
      val r = find(n)
      val cur = minOfRoot.get(r)
      if (cur == null || lt(n, cur)) minOfRoot.put(r, n)
    }
    val idType = pairs.schema("idA").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("component", idType)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach { n =>
      rows.add(org.apache.spark.sql.Row(n, minOfRoot.get(find(n))))
    }
    val labels = spark.createDataFrame(rows, outSchema)
    allIds match {
      case Some(ids) =>
        val idc = ids.columns.head
        ids.select(col(idc).as("id"))
          .join(broadcast(labels), Seq("id"), "left")
          .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      case None => labels
    }
  }

  /** Distributed label-propagation tier of [[components]]. */
  private def componentsLoop(pairs: DataFrame, maxIterations: Int,
      allIds: Option[DataFrame]): DataFrame = {
    // undirected edge list, both directions. No distinct: idA < idB pairs
    // cannot self-duplicate under reversal, and the min-aggregations below
    // absorb duplicate edges anyway — skipping it saves a full shuffle.
    val e0 = pairs.select(col("idA").as("src"), col("idB").as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    // label(v) = min reachable id. Each round: (1) neighbor-min propagation,
    // (2) pointer jumping label := label(label) — together O(log n) rounds.
    // localCheckpoint truncates the iterative plan lineage (without it the
    // logical plan doubles per round and planning itself OOMs).
    var labels = edges.groupBy("src")
      .agg(least(min("dst"), first("src")).as("component"))
      .select(col("src").as("id"), col("component"))
      .localCheckpoint()
    var converged = labels.isEmpty // no pairs → nothing to propagate
    var i = 0
    while (!converged && i < maxIterations) {
      val propagated = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("component").as("nbr"))
      val hop = labels.join(propagated, Seq("id"), "left")
        .select(col("id"), col("component"),
          least(col("component"), coalesce(col("nbr"), col("component"))).as("c2"))
      val jumped = hop.alias("a")
        .join(hop.select(col("id").as("c2"), col("c2").as("parent")).alias("b"),
          Seq("c2"), "left")
        .select(col("id"), col("component").as("__old"),
          least(col("c2"), coalesce(col("parent"), col("c2"))).as("component"))
        .localCheckpoint()
      // labels are monotonically non-increasing, so a round that changes no
      // label is a fixpoint — an early-exit existence probe over the
      // checkpointed partitions, no aggregation or extra join
      converged = jumped.where(col("__old") =!= col("component")).limit(1).isEmpty
      // the superseded round's checkpoint is dead once `jumped` materialized
      // (localCheckpoint is eager): free it now — O(log n) rounds would
      // otherwise pin O(log n) full label tables
      CheckpointUtil.freeCheckpoint(labels)
      labels = jumped.select("id", "component")
      i += 1
    }
    edges.unpersist()
    val withSingles = allIds match {
      case Some(ids) =>
        val idc = ids.columns.head
        ids.select(col(idc).as("id"))
          .join(labels, Seq("id"), "left")
          .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      case None => labels
    }
    withSingles
  }

  /** Exact embedding near-duplicate pairs by cosine ≥ threshold via
    * block-nested self-join. O(n²) compare — correct at any size but meant
    * for corpora that fit a broadcast (the oracle path); use
    * [[embeddingPairsLsh]] at scale. */
  def embeddingPairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // normalize once per row (norm computed ONCE, not per element — a
    // vec_norm inside the transform lambda would re-evaluate per element),
    // then a single dot product per pair
    val nv = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        gf.vec_norm(col(vecCol)).as("__n"))
      .select(col("__id"),
        transform(col("__v"), x => x / col("__n")).as("__nv"))
    val a = nv.select(col("__id").as("idA"), col("__nv").as("__va"))
    val b = nv.select(col("__id").as("idB"), col("__nv").as("__vb"))
    a.join(broadcast(b), col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        gf.vec_dot(col("__va"), col("__vb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Embedding near-duplicate pairs at scale: SRP-LSH bucket equi-join with
    * `tables` independent signatures (OR-amplification), cosine-verified.
    * Misses are possible (probabilistic recall); increase `tables` or lower
    * `bits` for higher recall. */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 16, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val v = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val banded = v.select(col("__id"), col("__v"), posexplode(
      transform(sequence(lit(0), lit(tables - 1)),
        t => gf.srp_signature(col("__v"), bits, xxhash64(t, lit(seed))))))
      .toDF("__id", "__v", "__table", "__sig")
    // shuffle only (table, sig, id) rows for candidates; join vectors back
    // by id for the surviving pairs (same shape as minhashPairs)
    val a = banded.select(col("__table"), col("__sig"), col("__id").as("idA"))
    val b = banded.select(col("__table"), col("__sig"), col("__id").as("idB"))
    val cand = a.join(b, Seq("__table", "__sig"))
      .where(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
    cand
      .join(v.select(col("__id").as("idA"), col("__v").as("__va")), Seq("idA"))
      .join(v.select(col("__id").as("idB"), col("__v").as("__vb")), Seq("idB"))
      .select(col("idA"), col("idB"),
        gf.vec_cosine(col("__va"), col("__vb")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Cross-tabulate a duplicate-pair frame (idA, idB, …) by a per-id label
    * (source, lang, shard) — the dedup ANALYTICS view: which source pairs
    * share near-dup mass (mirror sites, syndication, scraper overlap), the
    * input to "which feeds do we drop". Labels are order-normalized
    * (label_a ≤ label_b) so a pair counts once regardless of orientation;
    * pairs whose either label is NULL are dropped. Scale shape: the pair
    * frame is dup-sized (tiny next to the corpus); two id-keyed joins pick
    * up labels, then one label-pair-keyed count — the corpus itself only
    * ever ships (id, label). */
  def pairCrossTab(pairs: DataFrame, labels: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val l = labels.select(col(idCol), col(labelCol))
    pairs
      .join(l.select(col(idCol).as("idA"), col(labelCol).as("__la")), Seq("idA"))
      .join(l.select(col(idCol).as("idB"), col(labelCol).as("__lb")), Seq("idB"))
      .where(col("__la").isNotNull && col("__lb").isNotNull)
      .select(least(col("__la"), col("__lb")).as("label_a"),
        greatest(col("__la"), col("__lb")).as("label_b"))
      .groupBy("label_a", "label_b").agg(count(lit(1)).as("pairs"))
  }

  /** Snapshot diff between two corpus versions — the incremental-pipeline
    * primitive ("what changed since the last crawl/process run"): every id
    * is classified `added` (new only), `removed` (old only), `changed`
    * (both, text differs), or `unchanged`. Presence is tracked with
    * marker columns so NULL text still diffs correctly; content compare
    * ships 64-bit text hashes, so the full-outer join shuffles (id, hash)
    * rows — the text itself never moves (the standard 64-bit collision
    * caveat: a changed doc colliding with its old self reads `unchanged`,
    * ~1e-19 per doc). Output: (idCol, status). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"),
      gf.hash64(col(textCol)).as("__ho"), lit(1).as("__po"))
    val n = newDf.select(col(idCol).as("__id"),
      gf.hash64(col(textCol)).as("__hn"), lit(1).as("__pn"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(!(col("__ho") <=> col("__hn")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Winnowing overlap detection (Schleimer–Wilkerson–Aiken 2003 — the
    * MOSS plagiarism detector): each document keeps only its winnowed
    * k-byte-gram fingerprints (~1/`window` of positions, selection
    * guarantee: any shared substring of ≥ k + window − 1 bytes yields a
    * shared fingerprint), and pairs sharing ≥ `minShared` fingerprints
    * come back with overlap = shared / min(|A|, |B|) — a containment
    * estimate that catches a short doc embedded in a long one, where
    * whole-doc Jaccard ([[minhashPairs]]) dilutes away.
    *
    * Scale shape: the corpus shuffles as (fp, id) rows only — ~len/window
    * per doc, text never moves. Fingerprints present in more than
    * `maxDocFreq` documents (site boilerplate, license headers) are
    * DROPPED before the self-join — the df² pair blowup guard, same role
    * as the hot-bucket tiers of [[hammingPairsAdaptive]]; drops are
    * content-deterministic, so results stay partitioning-invariant. The
    * fingerprint frame is localCheckpointed: it feeds the doc-frequency
    * filter, both join sides, and the per-doc counts, and must not
    * re-derive the winnow scan four times.
    *
    * Returns (idA, idB, n_shared, n_a, n_b, overlap), idA < idB. */
  def winnowPairs(df: DataFrame, idCol: String, textCol: Column,
      k: Int = 24, window: Int = 16, minShared: Int = 2,
      maxDocFreq: Int = 256): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDocFreq >= 2, "maxDocFreq must be >= 2")
    val kept = cappedWinnowFps(
      winnowFps(df, idCol, textCol, k, window).localCheckpoint(),
      maxDocFreq)
    val perDoc = kept.groupBy("__id").agg(count(lit(1)).as("__nf"))
    val a = kept.select(col("__fp"), col("__id").as("idA"))
    val b = kept.select(col("__fp"), col("__id").as("idB"))
    finishWinnowPairs(
      a.join(b, Seq("__fp")).where(col("idA") < col("idB")),
      perDoc, perDoc, minShared)
  }

  /** [[winnowPairs]] across TWO corpora — the substring-level
    * decontamination check: which training documents contain a run of a
    * benchmark/eval document (or vice versa)? Token-n-gram
    * decontamination ([[Decontaminate]]) needs the gram to survive
    * tokenization; the winnowed byte-gram fingerprints catch shared runs
    * through whitespace/markup differences too, and the containment
    * overlap flags a short eval item embedded inside a long page. The
    * document-frequency cap is computed over the UNION of both sides
    * (boilerplate is boilerplate wherever it appears). Same scale shape
    * as [[winnowPairs]]; returns (idA from `a`, idB from `b`, n_shared,
    * n_a, n_b, overlap). */
  def winnowPairsBetween(a: DataFrame, b: DataFrame, idCol: String,
      textCol: Column, k: Int = 24, window: Int = 16, minShared: Int = 2,
      maxDocFreq: Int = 256): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    require(maxDocFreq >= 2, "maxDocFreq must be >= 2")
    val fa = winnowFps(a, idCol, textCol, k, window).localCheckpoint()
    val fb = winnowFps(b, idCol, textCol, k, window).localCheckpoint()
    val hot = fa.select("__fp").unionAll(fb.select("__fp"))
      .groupBy("__fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDocFreq)
      .select("__fp")
    val ka = fa.join(hot, Seq("__fp"), "left_anti")
    val kb = fb.join(hot, Seq("__fp"), "left_anti")
    finishWinnowPairs(
      ka.select(col("__fp"), col("__id").as("idA"))
        .join(kb.select(col("__fp"), col("__id").as("idB")), Seq("__fp")),
      ka.groupBy("__id").agg(count(lit(1)).as("__nf")),
      kb.groupBy("__id").agg(count(lit(1)).as("__nf")),
      minShared)
  }

  /** Cross-source duplication map at the substring level — which corpus
    * sources copy from each other (mirrors, scraped re-posts, shared
    * boilerplate beyond the df cap)? For every source pair: the count of
    * distinct winnowed fingerprints present in BOTH, with overlap =
    * shared / min(|A|, |B|). The source-level sibling of the per-doc
    * crosstab (q128 counts exact dups; this sees partial runs).
    *
    * Scale shape: (id, fp) rows shuffle once (df-capped like
    * [[winnowPairs]]), collapse to the distinct (source, fp) frame —
    * bounded by sources × distinct fps — and the pair join runs on THAT,
    * never on documents. Output is sources²/2 rows. */
  def winnowSourceCrosstab(df: DataFrame, idCol: String, textCol: Column,
      sourceCol: Column, k: Int = 24, window: Int = 16,
      maxDocFreq: Int = 256): DataFrame = {
    require(maxDocFreq >= 2, "maxDocFreq must be >= 2")
    val fps = df.select(col(idCol).as("__id"), sourceCol.as("__src"),
        explode(gf.winnow_fingerprints(textCol, k, window)).as("__f"))
      .select(col("__id"), col("__src"), col("__f.fp").as("__fp"))
      .distinct()
      .localCheckpoint()
    val kept = cappedWinnowFps(fps, maxDocFreq)
    val srcFps = kept.select(col("__src"), col("__fp")).distinct()
      .localCheckpoint()
    val per = srcFps.groupBy("__src").agg(count(lit(1)).as("__nf"))
    val a = srcFps.select(col("__fp"), col("__src").as("src_a"))
    val b = srcFps.select(col("__fp"), col("__src").as("src_b"))
    a.join(b, Seq("__fp")).where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      .join(per.select(col("__src").as("src_a"), col("__nf").as("n_a")),
        Seq("src_a"))
      .join(per.select(col("__src").as("src_b"), col("__nf").as("n_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        (col("n_shared").cast("double") / least(col("n_a"), col("n_b")))
          .as("overlap"))
  }

  /** Distinct (id, winnowed fingerprint) rows — the only thing that ever
    * shuffles in the winnow family. */
  private def winnowFps(df: DataFrame, idCol: String, textCol: Column,
      k: Int, window: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(gf.winnow_fingerprints(textCol, k, window)).as("__f"))
      .select(col("__id"), col("__f.fp").as("__fp"))
      .distinct()

  private def cappedWinnowFps(fps: DataFrame, maxDocFreq: Int): DataFrame =
    fps.withColumn("__df",
        count(lit(1)).over(Window.partitionBy("__fp")))
      .where(col("__df") <= maxDocFreq)
      .drop("__df")

  private def finishWinnowPairs(joined: DataFrame, perA: DataFrame,
      perB: DataFrame, minShared: Int): DataFrame =
    joined.groupBy("idA", "idB").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .join(perA.select(col("__id").as("idA"), col("__nf").as("n_a")),
        Seq("idA"))
      .join(perB.select(col("__id").as("idB"), col("__nf").as("n_b")),
        Seq("idB"))
      .select(col("idA"), col("idB"), col("n_shared"), col("n_a"),
        col("n_b"),
        (col("n_shared").cast("double") / least(col("n_a"), col("n_b")))
          .as("overlap"))

  /** Dedup-aware batch assignment for contrastive training: spread the
    * members of each near-dup component across DISTINCT batches, so a
    * document's near-duplicate never appears as an in-batch "negative"
    * (the classic InfoNCE false-negative: the loss pushes apart two
    * texts that are the same text).
    *
    * Rule: members rank within their component by id; batch =
    * (hash(seed:component) mod B + rank) mod B — a seeded offset so
    * components don't pile onto batch 0, then round-robin. Components
    * of size ≤ B are conflict-FREE by construction; larger ones wrap
    * with the minimum possible collisions (⌈size/B⌉ per batch).
    * Singletons (component == own id when [[components]] ran with
    * `allIds`) fall out of the same rule as pure hash spread.
    *
    * Scale shape: one window over component-keyed partitions (near-dup
    * cliques are small — the partition is the clique, not the corpus)
    * after the components pass the pipeline already ran; nothing else
    * shuffles. Deterministic for any partitioning: rank orders by id,
    * the hash is row-local. */
  def spreadAcrossBatches(clusters: DataFrame, nBatches: Int,
      seed: Long): DataFrame = {
    require(nBatches >= 2, "need at least 2 batches")
    require(!clusters.columns.exists(Set("__rank", "batch")),
      "input may not contain reserved columns __rank, batch")
    val w = Window.partitionBy("component").orderBy("id")
    val off = pmod(gf.hash64(concat(lit(s"$seed:"),
      col("component").cast("string"))), lit(nBatches.toLong))
    clusters
      .withColumn("__rank", row_number().over(w) - 1)
      .withColumn("batch", pmod(off + col("__rank"), lit(nBatches.toLong)))
      .drop("__rank")
  }

  /** LSH band planning for the MinHash family — "given P permutations
    * and a target Jaccard threshold t, how do I split them into
    * (bands b × rows r)": for every divisor pair b·r = P, the curve's
    * 50%-catch threshold `(1/b)^(1/r)` and the catch probability at
    * the target, `1 − (1 − t^r)^b`; `chosen` marks the pair whose
    * threshold is nearest t in LOG space (ties → more rows per band =
    * fewer false positives). Pure planning arithmetic over the
    * divisor grid (≤ √P pairs) — no corpus input; feeds
    * [[minhashPairs]]' (bands, rows) directly. */
  def lshBandPlan(spark: org.apache.spark.sql.SparkSession,
      totalPerms: Int, targetJaccard: Double): DataFrame = {
    require(totalPerms >= 2 && totalPerms <= 65536,
      "totalPerms must be in [2, 65536]")
    require(targetJaccard > 0 && targetJaccard < 1,
      "targetJaccard must be in (0, 1)")
    val pairs = (1 to totalPerms)
      .filter(totalPerms % _ == 0)
      .map { b =>
        val r = totalPerms / b
        val thr = math.pow(1.0 / b, 1.0 / r)
        val catchAtT = 1.0 -
          math.pow(1.0 - math.pow(targetJaccard, r), b)
        (b, r, thr, catchAtT,
          math.abs(math.log(thr) - math.log(targetJaccard)))
      }
    val best = pairs.minBy { case (_, r, _, _, dist) => (dist, -r) }
    import spark.implicits._
    pairs.map { case (b, r, thr, c, _) =>
      (b, r, thr, c, b == best._1)
    }.toDF("bands", "rows_per_band", "threshold", "catch_at_target",
      "chosen")
  }
}
