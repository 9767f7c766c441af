package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance string joins (record linkage / fuzzy dedup) without a
  * cartesian product.
  *
  * The blocking scheme is the PassJoin partition scheme (Li, Deng, Feng —
  * "PASS-JOIN: a partition-based method for similarity joins", PVLDB 2011,
  * public literature): to find all pairs with Levenshtein distance ≤ τ,
  * partition each indexed string into τ+1 contiguous segments. Any string
  * within distance τ must contain at least one segment EXACTLY (pigeonhole:
  * τ edits cannot touch all τ+1 segments), and a matching segment's
  * alignment can shift by at most τ positions. So the probe side generates,
  * per candidate indexed length L and segment index i, the substrings at
  * the ≤ 2τ+1 feasible positions, and candidates reduce to an equi-join on
  * (L, segment index, segment text) — shuffle-friendly, never all-pairs.
  * Candidates are then verified with the codegen'd `levenshtein`.
  *
  * Cost model: the index side emits τ+1 rows per string; the probe side
  * O(τ²) substrings per string — constants for the τ=1..3 regime record
  * linkage uses. Both sides shuffle on short segment keys (≈ len/(τ+1)
  * chars), and verification touches only equi-join survivors. Strings
  * shorter than τ+1 characters cannot be segmented (a τ-edit budget can
  * touch every nonempty segment), so they flow through a separate tiny
  * all-short bucket — documents below 4 chars are vanishingly rare in any
  * real corpus, and the bucket never mixes with the main path.
  *
  * Candidate rows deliberately carry the probe-side text: edit distance is
  * a short-string operation (titles, names, keys — it is meaningless on
  * documents), so shipping the text costs less than the extra id-rejoin
  * the ids-only discipline of the document-dedup family would require.
  */
object Fuzzy {

  /** All (leftId, rightId, dist) pairs with levenshtein(leftText,
    * rightText) ≤ maxDist. Nulls on either text side are dropped.
    *
    * Output is exact (blocking is complete + every candidate is verified)
    * with PAIR-SET semantics: one row per distinct (leftId, rightId)
    * combination — duplicate input rows with the same id (on EITHER side,
    * even with differing text under one id) do not multiply output rows.
    * `dist` is the smallest edit distance over the texts observed for the
    * pair (the true edit distance when ids are unique keys).
    *
    * `maxStringsPerSeg` guards the blocking join against hot segment keys
    * (the fuzzy-join analog of [[Dedup.sharedRuns]]' `maxDocsPerSpan`): a
    * segment shared by millions of indexed strings — a common prefix like
    * a URL scheme or a boilerplate title stem — would hot-spot one join
    * key AND multiply candidates quadratically. Keys indexing more than
    * `maxStringsPerSeg` strings are dropped from the blocking index. This
    * trades exactness for a skew bound, with a precise recall contract: a
    * true pair is missed ONLY if every one of its witnessing (length,
    * segment-index, segment-text) keys is hot — a pair sharing any
    * non-boilerplate segment always survives. The default (Long.MaxValue)
    * disables the guard and keeps the join exact. */
  def editDistanceJoin(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      maxDist: Int, maxStringsPerSeg: Long = Long.MaxValue): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(maxStringsPerSeg >= 1, "maxStringsPerSeg must be >= 1")
    val tau = maxDist

    val l = left.select(col(leftId).as("__lid"), col(leftText).as("__lt"))
      .where(col("__lt").isNotNull)
    val r = right.select(col(rightId).as("__rid"), col(rightText).as("__rt"))
      .where(col("__rt").isNotNull)

    if (tau == 0) {
      // Degenerate case: equality join, deduped to the same pair-set
      // semantics as the blocked path.
      return l.distinct().join(r.distinct(), col("__lt") === col("__rt"))
        .select(col("__lid").as(leftId), col("__rid").as(rightId),
          lit(0).as("dist"))
        .distinct()
    }

    // ---- index side: τ+1 even segments per string (long L only) ----
    // Even partition, longer segments last: q = ⌊L/(τ+1)⌋, r = L mod (τ+1);
    // len_i = q + [i ≥ τ+1−r], start_i = i·q + max(0, i−(τ+1−r)).
    val L = length(col("__rt"))
    val q = (L / (tau + 1)).cast("int")
    val rem = (L % (tau + 1)).cast("int")
    val segIdx = explode(sequence(lit(0), lit(tau)))
    val rLong = r.where(L >= tau + 1)
      .select(col("__rid"), col("__rt"), L.as("__len"), q.as("__q"),
        rem.as("__r"), segIdx.as("__i"))
    val segLen = col("__q") +
      when(col("__i") >= lit(tau + 1) - col("__r"), 1).otherwise(0)
    val segStart = col("__i") * col("__q") +
      greatest(lit(0), col("__i") - (lit(tau + 1) - col("__r")))
    val rSegsAll = rLong.select(col("__rid"), col("__len"), col("__i"),
      substring(col("__rt"), segStart + 1, segLen).as("__seg"))
    // Hot-key guard: one count aggregation over the (τ+1)·|R| segment
    // rows (cheap next to the candidate join it protects), then an
    // inner join against the surviving keys — same shape as sharedRuns'
    // span-frequency filter. Skipped entirely when the guard is off.
    val rSegs =
      if (maxStringsPerSeg == Long.MaxValue) rSegsAll
      else {
        val keep = rSegsAll.groupBy("__len", "__i", "__seg")
          .agg(count(lit(1)).as("__n"))
          .where(col("__n") <= maxStringsPerSeg)
          .select("__len", "__i", "__seg")
        rSegsAll.join(keep, Seq("__len", "__i", "__seg"))
      }

    // ---- probe side: substrings at the feasible (L, i, position) grid ----
    val M = length(col("__lt"))
    val lLens = l.select(col("__lid"), col("__lt"), M.as("__m"),
        explode(sequence(lit(-tau), lit(tau))).as("__dl"))
      .select(col("__lid"), col("__lt"), col("__m"),
        (col("__m") + col("__dl")).as("__len"))
      .where(col("__len") >= tau + 1)
    val lq = (col("__len") / (tau + 1)).cast("int")
    val lr = (col("__len") % (tau + 1)).cast("int")
    val lGrid = lLens.select(col("__lid"), col("__lt"), col("__m"),
        col("__len"), lq.as("__q"), lr.as("__r"),
        explode(sequence(lit(0), lit(tau))).as("__i"))
    val lSegLen = col("__q") +
      when(col("__i") >= lit(tau + 1) - col("__r"), 1).otherwise(0)
    val lSegStart = col("__i") * col("__q") +
      greatest(lit(0), col("__i") - (lit(tau + 1) - col("__r")))
    val pLo = greatest(lit(0), lSegStart - tau)
    val pHi = least(col("__m") - lSegLen, lSegStart + tau)
    val lCands = lGrid
      .select(col("__lid"), col("__lt"), col("__len"), col("__i"),
        lSegLen.as("__sl"), pLo.as("__plo"), pHi.as("__phi"))
      .where(col("__phi") >= col("__plo") && col("__sl") > 0)
      .select(col("__lid"), col("__lt"), col("__len"), col("__i"),
        col("__sl"),
        explode(sequence(col("__plo"), col("__phi"))).as("__p"))
      .select(col("__lid"), col("__lt"), col("__len"), col("__i"),
        substring(col("__lt"), col("__p") + 1, col("__sl")).as("__seg"))

    val mainPairs = lCands
      .join(rSegs, Seq("__len", "__i", "__seg"))
      .select(col("__lid"), col("__lt"), col("__rid"))
      .distinct()

    // ---- short bucket: indexed strings with < τ+1 chars ----
    // Partners must have length ≤ len + τ ≤ 2τ, so both inputs are
    // length-bounded constants of the corpus under the documented
    // "real text" assumption. Keying the join on the right string's
    // length (τ possible values) keeps the bucket a keyed join rather
    // than a single-task cross product, and the |lenL − lenR| ≤ τ
    // constraint prunes infeasible pairs before verification.
    val rShort = r.where(length(col("__rt")) < tau + 1)
      .select(col("__rid"), length(col("__rt")).as("__rlen"))
    val lShort = l.where(M <= 2 * tau)
      .select(col("__lid"), col("__lt"), M.as("__llen"),
        explode(sequence(
          greatest(lit(0), M - tau), least(lit(tau), M + tau))).as("__rlen"))
    val shortPairs = lShort.join(rShort, Seq("__rlen"))
      .select(col("__lid"), col("__lt"), col("__rid"))

    // Verify against the DEDUPED right side and reduce to one row per
    // (leftId, rightId): duplicate right rows would otherwise multiply
    // through this join (mainPairs is distinct, but the verification
    // join is not), and duplicate ids carrying different texts would
    // yield several distances — min() restores the pair-set contract.
    val verified = mainPairs.union(shortPairs).distinct()
      .join(r.distinct(), Seq("__rid"))
      .select(col("__lid"), col("__rid"),
        levenshtein(col("__lt"), col("__rt")).as("dist"))
      .where(col("dist") <= tau)
    verified.groupBy(col("__lid").as(leftId), col("__rid").as(rightId))
      .agg(min(col("dist")).as("dist"))
  }

  /** Self-join flavor: unordered pairs (idA < idB) within edit distance
    * maxDist — the fuzzy-dedup primitive (typo'd titles, OCR noise,
    * boilerplate variants). `maxStringsPerSeg` as in [[editDistanceJoin]]. */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, maxStringsPerSeg: Long = Long.MaxValue): DataFrame = {
    val out = editDistanceJoin(
      df.select(col(idCol).as("__a_id"), col(textCol).as("__a_t")),
      "__a_id", "__a_t",
      df.select(col(idCol).as("__b_id"), col(textCol).as("__b_t")),
      "__b_id", "__b_t", maxDist, maxStringsPerSeg)
    out.where(col("__a_id") < col("__b_id"))
      .select(col("__a_id").as("idA"), col("__b_id").as("idB"), col("dist"))
  }
}
