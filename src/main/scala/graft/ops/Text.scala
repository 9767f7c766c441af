package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.api.{functions => gf}

/** Corpus-level term statistics: term/document frequencies and TF-IDF term
  * ranking — the classic vocabulary/feature-extraction pass of a text
  * pipeline.
  *
  * Scale shape: one explode (rows = token occurrences, but each row is a
  * short string + id, not the document), one (doc, term) aggregation, one
  * term-keyed join for document frequencies, and a per-doc top-k window
  * that Spark executes as WindowGroupLimit (per-partition k-row heaps
  * before the shuffle). Nothing materializes per-document vocabularies on
  * the driver.
  */
object Text {

  /** (doc, term, tf): whitespace-token term frequencies per document. */
  def docTermFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(split(col(textCol), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))

  /** Classic smoothed TF-IDF score: tf · (ln((N+1)/(df+1)) + 1). */
  def tfidfScore(tf: Column, df: Column, nDocs: Long): Column =
    tf * (log(lit(nDocs + 1.0) / (df + 1.0)) + 1.0)

  /** Fixed-size character chunking with overlap — the embedding/context
    * windowing pass (RAG indexing, long-doc splitting). Windows start
    * every `size − overlap` characters; every character of the text is
    * covered, the last window may be short, and consecutive windows share
    * exactly `overlap` characters (except before a short tail). Empty
    * text → empty array. Pure column expression: chunking happens at the
    * scan; explode downstream if chunk-per-row is wanted. */
  def chunk(text: Column, size: Int, overlap: Int = 0): Column = {
    require(size >= 1, "size must be >= 1")
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val step = size - overlap
    when(length(text) >= 1,
      transform(sequence(lit(0L),
          floor((length(text).cast("double") - 1) / step).cast("long")),
        i => text.substr((i * step + 1).cast("int"), lit(size))))
      .otherwise(array())
  }

  /** Heuristic HTML → text boilerplate stripping (the web-corpus cleaning
    * pass): drops script/style blocks and comments with their contents,
    * replaces remaining tags with spaces (token boundaries survive),
    * unescapes the six ubiquitous entities (amp last, so `&amp;lt;`
    * correctly becomes the literal text `&lt;`), and collapses whitespace.
    *
    * Deliberately NOT an HTML5 parser — it is a deterministic, fully
    * codegen'd column expression built from engine-portable regexes (the
    * Java-regex ∩ RE2 subset, no backreferences), so the same definition
    * runs bit-identically in the DuckDB oracle. Malformed markup degrades
    * to extra whitespace, never to an error. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (f, t)) => replace(c, lit(f), lit(t)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Markdown → plain text, the [[stripHtml]] sibling for the other big
    * web-corpus source format (READMEs, wikis, forum exports): fenced and
    * inline code keep their CONTENT but lose the markers, images reduce
    * to their alt text and links to their anchor text, structural
    * prefixes (headers, blockquotes, bullets, ordered-list numbers,
    * horizontal rules) drop, bold/italic emphasis unwraps, and
    * whitespace collapses. A heuristic cleaner, not a CommonMark parser
    * — intra-word underscores can unwrap (documented trade-off), nested
    * constructs resolve in the fixed pass order below. Every regex stays
    * inside the Java∩RE2 subset so a SQL engine replays the chain
    * byte-for-byte. Pure per-row scan-side column, shuffle-free. */
  def stripMarkdown(md: Column): Column = {
    // pass order is load-bearing: fences before inline code (a fence's
    // body may contain backticks? no — [^`]; but the ``` marker itself
    // must not be eaten as two inline spans), images before links
    // (![a](u) contains [a](u)), hr before bullets (- - - is not a list)
    val noFence = regexp_replace(md, "(?s)```[^\\n]*\\n(.*?)```", "$1")
    val noInline = regexp_replace(noFence, "`([^`]*)`", "$1")
    val noImg = regexp_replace(noInline,
      "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLink = regexp_replace(noImg, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noHeader = regexp_replace(noLink, "(?m)^#{1,6}[ \\t]+", "")
    val noQuote = regexp_replace(noHeader, "(?m)^[ \\t]*>[ \\t]?", "")
    val noHr = regexp_replace(noQuote,
      "(?m)^[ \\t]*([-*_][ \\t]*){3,}$", "")
    val noBullet = regexp_replace(noHr, "(?m)^[ \\t]*[-*+][ \\t]+", "")
    val noOrdered = regexp_replace(noBullet, "(?m)^[ \\t]*\\d+\\.[ \\t]+", "")
    val noBold1 = regexp_replace(noOrdered, "\\*\\*([^*]+)\\*\\*", "$1")
    val noBold2 = regexp_replace(noBold1, "__([^_]+)__", "$1")
    val noItal1 = regexp_replace(noBold2, "\\*([^*]+)\\*", "$1")
    val noItal2 = regexp_replace(noItal1, "_([^_]+)_", "$1")
    trim(regexp_replace(noItal2, "\\s+", " "))
  }

  /** Deterministic T5-style span corruption (Raffel et al. 2020's
    * denoising objective, made a pure function of the data): token
    * position p of doc d starts a masked span iff
    * pmod(hash64("d:p"), every) == 0, each trigger masks `spanLen`
    * consecutive tokens, and overlapping triggers merge into one span.
    * Expected corruption ≈ spanLen/every (defaults ≈ 15%). The masked
    * input replaces each span with `<extra_id_k>` (k = span index within
    * the doc, 0-based, in order); the target lists each sentinel
    * followed by the span's original tokens — exactly the seq2seq pair a
    * denoising trainer consumes, reproducible across engines, retries,
    * and partitionings (no RNG anywhere).
    *
    * Output: (idCol, input_text, target_text, n_tokens, n_masked,
    * n_spans); empty/null docs yield empty strings and zero counts.
    *
    * Scale shape: one (doc)-keyed explode + windows ordered by position
    * WITHIN each doc (doc-length bounded — the scale axis is document
    * count, not document size) + one per-doc aggregation that REUSES the
    * window's hash partitioning: the corpus shuffles exactly once.
    * Empty/null docs ride through the outer explode as a placeholder
    * row, so no restore-join (a second corpus-sized shuffle) is needed.
    *
    * SIZE THE SHUFFLE to the token volume, not the doc count: each
    * shuffle partition materializes its docs' (pos, token) rows for the
    * window sort, so keep tokens/partition in the low millions
    * (spark.sql.shuffle.partitions, or AQE advisory partition size) —
    * measured: 990M tokens at 32 partitions OOMs an 8 GB heap, at 256
    * partitions it completes (SURVEY §8.2). */
  def spanCorrupt(df: DataFrame, idCol: String, text: Column,
      every: Int = 20, spanLen: Int = 3): DataFrame = {
    require(every >= 1, "every must be >= 1")
    require(spanLen >= 1, "spanLen must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // outer explode + validity flag instead of a filter: an empty/null
    // doc keeps one placeholder row (valid=0) and thus its output row
    val toks = df
      .select(col(idCol).as("__id"),
        posexplode_outer(split(text, "\\s+")).as(Seq("__p", "__t")))
      .withColumn("__v",
        (col("__t").isNotNull && length(col("__t")) > 0).cast("int"))
    val trig = when(col("__v") === 1,
      (pmod(gf.hash64(concat(col("__id").cast("string"), lit(":"),
        col("__p").cast("string"))), lit(every.toLong)) === 0).cast("int"))
      .otherwise(lit(0))
    // windows order VALID tokens first (then by position): an invalid
    // placeholder row (leading-whitespace empty token, empty doc) must
    // never occupy a row slot inside a span window, or it would shift
    // which tokens fall within spanLen−1 rows of a trigger
    val wSpan = Window.partitionBy("__id")
      .orderBy(col("__v").desc, col("__p"))
      .rowsBetween(-(spanLen - 1), 0)
    val wSeq = Window.partitionBy("__id")
      .orderBy(col("__v").desc, col("__p"))
    val marked = toks
      .withColumn("__m",
        when(col("__v") === 1, max(trig).over(wSpan)).otherwise(lit(0)))
      .withColumn("__new",
        (col("__m") === 1 &&
          coalesce(lag(col("__m"), 1).over(wSeq), lit(0)) === 0).cast("int"))
      .withColumn("__k", sum(col("__new")).over(wSeq) - 1)
    val sentinel = concat(lit("<extra_id_"), col("__k").cast("string"),
      lit(">"))
    val itok = when(col("__v") === 0, lit(null).cast("string"))
      .when(col("__m") === 0, col("__t"))
      .when(col("__new") === 1, sentinel)
      .otherwise(lit(null).cast("string"))
    val ttok = when(col("__v") === 1 && col("__m") === 1,
        when(col("__new") === 1, concat(sentinel, lit(" "), col("__t")))
          .otherwise(col("__t")))
      .otherwise(lit(null).cast("string"))
    marked.groupBy(col("__id").as(idCol)).agg(
      array_join(transform(
        filter(array_sort(collect_list(struct(col("__p"),
          itok.as("__it")))), x => x.getField("__it").isNotNull),
        x => x.getField("__it")), " ").as("input_text"),
      array_join(transform(
        filter(array_sort(collect_list(struct(col("__p"),
          ttok.as("__tt")))), x => x.getField("__tt").isNotNull),
        x => x.getField("__tt")), " ").as("target_text"),
      sum(col("__v").cast("long")).as("n_tokens"),
      sum(col("__m").cast("long")).as("n_masked"),
      sum(col("__new").cast("long")).as("n_spans"))
  }

  /** Deterministic fill-in-the-middle transformation (Bavarian et al.
    * 2022 — the infilling objective code models train on), as a pure
    * function of the data: a `fimRate` hash-selected subset of docs is
    * split at two hash-derived character cuts into (prefix, middle,
    * suffix) and re-serialized in PSM order
    * `<fim_prefix>P<fim_suffix>S<fim_middle>M`; the rest pass through
    * untouched. Cut arithmetic (c1 = pmod(h1, n+1),
    * c2 = c1 + pmod(h2, n−c1+1)) is integer-exact, so any engine, retry,
    * or partitioning produces identical splits. Scan-side only — no
    * shuffle, no RNG.
    *
    * Output: (idCol, fim (0/1), c1, c2, out_text). */
  def fimTransform(df: DataFrame, idCol: String, text: Column,
      fimRate: Int = 2): DataFrame = {
    require(fimRate >= 1, "fimRate must be >= 1 (1 = every doc)")
    val idS = col(idCol).cast("string")
    val n = length(text)
    val sel = pmod(gf.hash64(concat(idS, lit("|fim"))),
      lit(fimRate.toLong)) === 0
    val c1 = pmod(gf.hash64(concat(idS, lit("|c1"))), (n + 1).cast("long"))
    val c2 = c1 + pmod(gf.hash64(concat(idS, lit("|c2"))),
      (n - c1 + 1).cast("long"))
    // substr is 1-based; prefix = [1, c1], middle = (c1, c2], suffix past c2
    val prefix = substring(text, lit(1), c1.cast("int"))
    val middle = text.substr(c1.cast("int") + 1, (c2 - c1).cast("int"))
    val suffix = text.substr(c2.cast("int") + 1, (n - c2).cast("int"))
    val fimText = concat(lit("<fim_prefix>"), prefix,
      lit("<fim_suffix>"), suffix, lit("<fim_middle>"), middle)
    df.select(col(idCol),
      when(sel && n > 0, lit(1)).otherwise(lit(0)).as("fim"),
      when(sel && n > 0, c1).otherwise(lit(0L)).as("c1"),
      when(sel && n > 0, c2).otherwise(lit(0L)).as("c2"),
      when(sel && n > 0, fimText).otherwise(text).as("out_text"))
  }

  /** Readability scores (Flesch reading-ease + Flesch–Kincaid grade) as
    * a deterministic quality signal: syllables(word) = max(1, number of
    * [aeiouy]+ runs, case-insensitive) — the standard vowel-run
    * approximation WITHOUT the silent-e heuristic, pinned so two engines
    * cannot disagree on edge words; sentences = [.!?]+ runs (min 1);
    * words = whitespace tokens. ease = 206.835 − 1.015·(W/S) −
    * 84.6·(Syl/W); grade = 0.39·(W/S) + 11.8·(Syl/W) − 15.59. Pure
    * scan-side arithmetic on three regexp counts — no shuffle, null/empty
    * text → NULL scores.
    *
    * Output: original columns + n_words, n_sentences, n_syllables,
    * flesch_ease, fk_grade (rounded to `roundTo`). */
  def readability(df: DataFrame, text: Column,
      roundTo: Int = 6): DataFrame = {
    val words = size(filter(split(text, "\\s+"), w => length(w) > 0))
      .cast("long")
    val sentences = greatest(lit(1L),
      size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long"))
    // per-word max(1, runs): total = runs + number of vowel-less words
    val vowelRuns = size(regexp_extract_all(lower(text),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val vowellessWords = size(filter(split(lower(text), "\\s+"),
      w => length(w) > 0 && !w.rlike("[aeiouy]"))).cast("long")
    val syllables = vowelRuns + vowellessWords
    val wps = words.cast("double") / sentences
    val spw = syllables.cast("double") / words
    df.withColumn("n_words", words)
      .withColumn("n_sentences", sentences)
      .withColumn("n_syllables", syllables)
      .withColumn("flesch_ease", when(words > 0, round(
        lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, roundTo)))
      .withColumn("fk_grade", when(words > 0, round(
        lit(0.39) * wps + lit(11.8) * spw - lit(15.59), roundTo)))
  }

  /** BM25 top-k retrieval (Robertson/Sparck-Jones probabilistic ranking,
    * Lucene-style non-negative idf): score(q,d) =
    * Σ_t  ln(1 + (N − df + ½)/(df + ½)) · tf(k1+1) / (tf + k1(1 − b + b·dl/avgdl))
    * over the DISTINCT terms of the query.
    *
    * Scale shape: corpus statistics (tf, dl) build with shuffles keyed by
    * (doc, term)/(doc); the query side broadcasts everywhere — term
    * frequencies are semi-join-pruned to query terms BEFORE df aggregation,
    * so document frequencies are computed only for the terms that matter,
    * never the whole vocabulary. Corpus-global N/avgdl ride a broadcast
    * 1-row frame (no driver action). Ranking sorts by score rounded to
    * `roundTo` then id, so ordering is reproducible across engines.
    *
    * Returns (query_id, idCol, score, rank) with rank 1..k per query. */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6, materializePostings: Boolean = false): DataFrame = {
    // the search has three postings consumers (tf pruning, df aggregation,
    // corpus stats); without materialization each re-derives the postings
    // from the text — fastest for a one-shot query on a scan-cheap corpus.
    // `materializePostings` trades one localCheckpoint write for the two
    // extra scans when the raw text is the expensive part; long-lived
    // deployments should instead write bm25Postings out bucketed by term
    // and call bm25Search directly.
    val p = bm25Postings(corpus, idCol, textCol)
    val pp = if (materializePostings) p.localCheckpoint() else p
    bm25Search(pp, queries, idCol, textCol, k, k1, b, roundTo)
  }

  /** The BM25 postings list: one row per (doc, term) with the term
    * frequency and the document length — everything per-query scoring
    * needs, built in a SINGLE corpus scan (dl rides a window over the tf
    * aggregate instead of a second explode). At scale this is the index:
    * write it out bucketed/partitioned by `term` once, and every
    * subsequent [[bm25Search]] runs off the (pruned) postings without ever
    * touching the raw text again. Columns: (doc, term, tf, dl). */
  def bm25Postings(corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    docTermFrequencies(corpus, idCol, textCol)
      .withColumn("dl", sum("tf").over(Window.partitionBy("doc")))

  /** BM25 scoring over a prebuilt [[bm25Postings]] frame. The query side
    * broadcasts everywhere; postings are semi-join-pruned to query terms
    * BEFORE the df aggregation, so document frequencies are computed only
    * for terms that matter, never the whole vocabulary. Corpus-global
    * N/avgdl ride a broadcast 1-row frame (no driver action). */
  def bm25Search(postings: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // (doc, dl) pairs are unique per doc and already clustered by doc, so
    // neither the distinct nor the 1-row agg re-shuffles the postings
    val stats = postings.select(col("doc"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"))
    val qt = queries
      .select(col(idCol).as("query_id"),
        explode(split(col(textCol), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
      .distinct()
    val tfq = postings.join(broadcast(qt.select("term").distinct()),
      Seq("term"), "left_semi")
    val dfq = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc"))
      .agg(sum(
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
          * (col("tf") * (k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
              + lit(b) * col("dl").cast("double") / col("avgdl")))).as("__score"))
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("__score"), roundTo).desc, col("doc"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc").as(idCol),
        round(col("__score"), roundTo).as("score"), col("rank"))
  }

  /** Top-k most distinctive terms per document, ranked by the exact
    * rational tf/df (monotone in tf and 1/df like tf·idf, but free of
    * transcendental rounding — the ranking is bit-reproducible across
    * engines); ties by higher tf, then term. Returns
    * (idCol, term, tf, df, rank) with rank in 1..k. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = docTermFrequencies(df, idCol, textCol)
    // df(term) = number of documents containing the term: (doc, term) rows
    // are unique after the tf aggregation, so a plain count suffices
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc")
      .orderBy((col("tf").cast("double") / col("df")).desc,
        col("tf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc").as(idCol), col("term"), col("tf"), col("df"),
        col("rank"))
  }

  /** Corpus-frequency boilerplate removal (the CCNet/RefinedWeb header-
    * footer pass): drop EVERY occurrence of any paragraph appearing in at
    * least `minDocs` distinct documents — nav bars, cookie banners, share
    * buttons — and reassemble each document in original paragraph order.
    * Complements [[Dedup.dedupParagraphs]] (which keeps first occurrences):
    * a paragraph above the frequency threshold is presumed template, so no
    * occurrence survives, while below-threshold repeats are left alone.
    *
    * With `scopeCols` the frequency is counted within each scope (the
    * CCNet per-domain-shard convention) — a paragraph is boilerplate only
    * where it is locally common.
    *
    * Scale: paragraph doc-frequencies aggregate with map-side partials
    * (one paragraph-keyed shuffle, the [[Dedup.dedupParagraphs]] cost);
    * the boilerplate set is small whenever minDocs is a genuine
    * boilerplate threshold, so flagging defaults to a broadcast join
    * against the un-shuffled exploded corpus — pass
    * `broadcastFlags = false` for aggressive thresholds (minDocs near 2
    * on a huge corpus), where the flagged set is data-sized and must
    * shuffle-join instead. The only other shuffle is the doc-keyed
    * reassembly. Null text rows pass through as ("", 0, 0) — consistent
    * with [[Blocklist.filterBlocked]]'s null passthrough, and they never
    * pollute the frequency pool. Output: (idCol, clean_text, n_kept,
    * n_dropped). */
  def removeFrequentParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String, minDocs: Int,
      scopeCols: Seq[String] = Nil,
      broadcastFlags: Boolean = true): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    require(minDocs >= 2, "minDocs must be >= 2 (1 would drop everything)")
    val reserved = Seq("__did", "__idx", "__para", "__df", "__boiler")
    require(!df.columns.exists(reserved.contains),
      s"input may not contain reserved columns ${reserved.mkString(", ")}")
    val scope = scopeCols.map(col)
    val exploded = df.where(col(textCol).isNotNull).select(
      (col(idCol).as("__did") +: scope) :+
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("__idx", "__para")): _*)
    val boiler0 = exploded
      .select((col("__did") +: col("__para") +: scope): _*).distinct()
      .groupBy(col("__para") +: scope: _*)
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDocs)
      .select(col("__para") +: scope: _*)
      .withColumn("__boiler", lit(true))
    val boiler = if (broadcastFlags) broadcast(boiler0) else boiler0
    val cleaned = exploded
      .join(boiler, ("__para" +: scopeCols).toSeq, "left")
      .groupBy(col("__did").as(idCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("__boiler").isNull,
            struct(col("__idx").as("i"), col("__para").as("p"))))),
          s => s.getField("p"))).as("clean_text"),
        sum(when(col("__boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__boiler").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
    val nullRows = df.where(col(textCol).isNull)
      .select(col(idCol), lit("").as("clean_text"),
        lit(0L).as("n_kept"), lit(0L).as("n_dropped"))
    cleaned.unionByName(nullRows)
  }

  /** Top-k collocations by pointwise mutual information — the phrase-mining
    * pass (Church & Hanks 1990, public literature): adjacent token pairs
    * whose co-occurrence beats the independence assumption,
    * PMI = ln( (c_ab/M) / ((c_a/N)·(c_b/N)) ) with N total tokens and M
    * total bigrams. High-PMI pairs are multi-word expressions ("New York",
    * "machine learning"); `minCount` suppresses the unstable low-count
    * tail that PMI notoriously over-scores.
    *
    * Scale: one token explode feeds both count passes (unigrams and
    * adjacent bigrams — map-side-combinable aggregations); the unigram
    * table is vocabulary-bounded, so both probability joins broadcast; the
    * global top-k is a TakeOrdered, never a full sort. PMI is ranked on
    * its round(6) value with an (a, b) tie-break, so the ranking is
    * reproducible across engines and partitionings. Output:
    * (token_a, token_b, pair_count, pmi, rank). */
  def collocations(df: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 5L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(minCount >= 1, "minCount must be >= 1")
    // Corpus tokenization: \s+ runs with empties dropped — the same rule
    // docTermFrequencies / Classify / tokenHashes use. Adjacency is over
    // the FILTERED sequence, so "a  b" (double space, tabs, newlines)
    // counts as the adjacent pair (a, b) instead of silently vanishing.
    val wsCol = filter(split(col(textCol), "\\s+"),
      w => length(w) > 0)
    val toks = df.select(col(idCol).as("__did"),
        posexplode(wsCol).as(Seq("__i", "__w")))
    val uni = toks.groupBy(col("__w")).agg(count(lit(1)).as("__ca"))
    val bi = df.select(col(idCol).as("__did"), wsCol.as("__ws"))
      .select(col("__did"), posexplode(col("__ws")).as(Seq("__i", "__a")),
        col("__ws"))
      .select(col("__a"),
        try_element_at(col("__ws"), col("__i") + 2).as("__b"))
      .where(col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__cab"))
    val n = math.max(toks.count().toDouble, 1.0)
    // coalesce: an empty bigram frame sums to NULL; the value is never
    // used then (everything downstream is empty), it just must not throw
    val m = math.max(bi.agg(coalesce(sum("__cab"), lit(0L)))
      .collect()(0).getLong(0).toDouble, 1.0)
    val scored = bi.where(col("__cab") >= minCount)
      .join(broadcast(uni.withColumnRenamed("__w", "__a")
        .withColumnRenamed("__ca", "__na")), Seq("__a"))
      .join(broadcast(uni.withColumnRenamed("__w", "__b")
        .withColumnRenamed("__ca", "__nb")), Seq("__b"))
      .select(col("__a"), col("__b"), col("__cab"),
        round(log((col("__cab") / lit(m)) /
          ((col("__na") / lit(n)) * (col("__nb") / lit(n)))), 6).as("pmi"))
    scored
      .orderBy(desc("pmi"), asc("__a"), asc("__b"))
      .limit(k)
      .select(col("__a").as("token_a"), col("__b").as("token_b"),
        col("__cab").as("pair_count"), col("pmi"))
      // k rows at this point — the unpartitioned ranking window is cheap
      .withColumn("rank", row_number().over(Window
        .orderBy(desc("pmi"), asc("token_a"), asc("token_b"))))
  }

  /** Zipf-law diagnostic of a corpus's token frequency distribution —
    * the classic naturalness check: real language has log(count) ≈
    * intercept − slope·log(rank) with slope near 1; templated or
    * machine-spun text bends the curve (and the r² drops). Pipelines run
    * it as a cheap corpus fingerprint before and after cleaning.
    *
    * Estimator: type counts group once (the only corpus-sized shuffle);
    * ranks come from the COUNT-OF-COUNTS table (distinct count values —
    * tiny) through [[Packing.withPrefixSum]], tie-averaged in exact
    * integer 2r form; the OLS fit of ln(count) on ln(rank) folds Σx, Σy,
    * Σxx, Σxy, Σyy through `exact_sum` over that same tiny table.
    * Deterministic under any partitioning; ln/division ulps only.
    *
    * @return one row: n_tokens, n_types, max_count, slope (NEGATED so
    *         Zipf-like corpora read ≈ +1), intercept, r2 — NaN fit
    *         columns when fewer than 2 distinct counts exist
    */
  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    import graft.api.{functions => gf}
    val toks = df.where(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .where(length(col("__w")) > 0)
    val types = toks.groupBy("__w").agg(count(lit(1)).as("__c"))
    val cc = types.groupBy(col("__c")).agg(count(lit(1)).as("__f"))
      .withColumn("__negc", -col("__c"))
    // rank by count DESC: inclusive prefix of −c ascending; tie-averaged
    // rank in exact integers: 2r = 2·cum − f + 1
    val pre = Packing.withPrefixSum(cc, "__negc", "__f", "__cum")
      .withColumn("__x", log((lit(2L) * col("__cum") - col("__f") + 1L)
        .cast("double") / 2.0))
      .withColumn("__y", log(col("__c").cast("double")))
    val s = pre.agg(
      coalesce(sum(col("__c") * col("__f")), lit(0L)).as("n_tokens"),
      coalesce(sum(col("__f")), lit(0L)).as("n_types"),
      coalesce(max(col("__c")), lit(0L)).as("max_count"),
      gf.exact_sum(col("__f") * col("__x")).as("__sx"),
      gf.exact_sum(col("__f") * col("__y")).as("__sy"),
      gf.exact_sum(col("__f") * col("__x") * col("__x")).as("__sxx"),
      gf.exact_sum(col("__f") * col("__x") * col("__y")).as("__sxy"),
      gf.exact_sum(col("__f") * col("__y") * col("__y")).as("__syy"))
    val n = col("n_types").cast("double")
    val covN = n * col("__sxy") - col("__sx") * col("__sy")
    val varX = n * col("__sxx") - col("__sx") * col("__sx")
    val varY = n * col("__syy") - col("__sy") * col("__sy")
    s.select(col("n_tokens"), col("n_types"), col("max_count"),
      when(varX > 0, -(covN / varX)).otherwise(lit(Double.NaN)).as("slope"),
      when(varX > 0, (col("__sy") - (covN / varX) * col("__sx")) / n)
        .otherwise(lit(Double.NaN)).as("intercept"),
      when(varX > 0 && varY > 0, covN * covN / (varX * varY))
        .otherwise(lit(Double.NaN)).as("r2"))
  }

  /** Heaps'-law fit — vocabulary growth V(N) ≈ K·N^β over the corpus
    * read in `idCol` order (Heaps 1978; the planning companion of
    * [[zipfFit]]: β says how fast a tokenizer's OOV mass or a
    * dedup index's key space grows as the corpus scales, natural text
    * sits at β ≈ 0.4–0.6, and a β near 1 is the machine-generated /
    * id-soup signature). One (N_d, V_d) point per non-empty document:
    * N_d = cumulative token count through doc d, V_d = cumulative
    * distinct types (a type counts at its FIRST document, i.e.
    * min-id), then OLS of ln V on ln N.
    *
    * Scale shape: tokens shuffle once into (type, first-doc) and once
    * into per-doc counts; both cumulatives run through the distributed
    * two-level prefix sum ([[Packing.withPrefixSumLong]] — no global
    * window), and the moment folds are exact_sum, so the one-row
    * report is deterministic under any partitioning. Returns
    * (n_docs, n_tokens, n_types, beta, ln_k, r2) — NaN fit columns
    * when fewer than 2 distinct points exist. */
  def heapsFit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.api.{functions => gf}
    // the exploded token frame feeds both the per-doc census and the
    // first-occurrence pass, but it is corpus-size × tokens-per-doc —
    // deliberately NOT checkpointed: re-running a scan-side explode
    // twice is far cheaper than materializing it (a localCheckpoint
    // here OOM'd the 5M-doc probe; the two consumers each reduce it
    // map-side to doc- or type-sized frames immediately)
    val toks = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .where(length(col("__w")) > 0)
    val perDoc = toks.groupBy("__doc").agg(count(lit(1)).as("__tc"))
    val firstOcc = toks.groupBy("__w").agg(min(col("__doc")).as("__doc"))
      .groupBy("__doc").agg(count(lit(1)).as("__nv"))
    val merged = perDoc.join(firstOcc, Seq("__doc"), "left")
      .na.fill(0L, Seq("__nv"))
    val cum = Packing.withPrefixSumLong(
      Packing.withPrefixSumLong(merged, "__doc", "__tc", "__N"),
      "__doc", "__nv", "__V")
    val pts = cum.select(
      log(col("__N").cast("double")).as("__x"),
      log(col("__V").cast("double")).as("__y"),
      col("__tc"))
    val s = pts.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("__tc")), lit(0L)).as("n_tokens"),
      gf.exact_sum(col("__x")).as("__sx"),
      gf.exact_sum(col("__y")).as("__sy"),
      gf.exact_sum(col("__x") * col("__x")).as("__sxx"),
      gf.exact_sum(col("__x") * col("__y")).as("__sxy"),
      gf.exact_sum(col("__y") * col("__y")).as("__syy"))
    val types = firstOcc.agg(coalesce(sum(col("__nv")), lit(0L))
      .as("n_types"))
    val n = col("n_docs").cast("double")
    val covN = n * col("__sxy") - col("__sx") * col("__sy")
    val varX = n * col("__sxx") - col("__sx") * col("__sx")
    val varY = n * col("__syy") - col("__sy") * col("__sy")
    s.crossJoin(types) // 1×1 scalar join
      .select(col("n_docs"), col("n_tokens"), col("n_types"),
        when(varX > 0, covN / varX).otherwise(lit(Double.NaN)).as("beta"),
        when(varX > 0, (col("__sy") - (covN / varX) * col("__sx")) / n)
          .otherwise(lit(Double.NaN)).as("ln_k"),
        when(varX > 0 && varY > 0, covN * covN / (varX * varY))
          .otherwise(lit(Double.NaN)).as("r2"))
  }

  /** Within-document repeated-n-gram rate — the text-degeneration
    * metric of Holtzman et al. 2020 ("The Curious Case of Neural Text
    * Degeneration"): `1 − distinct_ngrams / total_ngrams` over the
    * document's word n-grams (0 for fewer than n tokens: nothing can
    * repeat). Model-generated loops score near 1; natural prose sits
    * near 0. Pure scan-side array expressions (tokens → n-gram
    * strings → array_distinct) — no explode, no shuffle; aggregate
    * per group outside. */
  def repeatedNgramRate(text: Column, n: Int): Column = {
    require(n >= 1 && n <= 16, "n must be in [1, 16]")
    val toks = split(text, " ")
    val total = size(toks) - (n - 1)
    val grams = transform(sequence(lit(1), greatest(total, lit(1))),
      i => array_join(slice(toks, i, lit(n)), " "))
    when(total <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast("double")
        / total.cast("double"))
  }

  /** Unigram-context watermark detection (Kirchenbauer et al. 2023,
    * "A Watermark for Large Language Models"): under the watermark, a
    * generator restricted half its vocabulary per step using a hash of
    * the PREVIOUS token, so watermarked text shows an excess of
    * "green" bigrams — `green(prev, cur) = hash64(prev:cur) even`
    * (γ = 1/2). Per group over per-document censuses:
    * `z = (g − m/2) / √(m/4)` with m = bigram count; the flag census
    * `z > z₀` is computed in INTEGER space
    * (`2g − m > 0 ∧ (2g − m)² > z₀²·m`), so it is exact on any
    * engine. Returns (groupCols…, n_docs, n_bigrams, n_green,
    * mean_z, n_flagged). Documents with < 2 tokens carry no census
    * (dropped). The hash rule is the engine's splitmix64 — any engine
    * replays it from the tokens alone. */
  def watermarkStats(df: DataFrame, groupCols: Seq[String],
      textCol: Column, z0: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(z0 >= 1 && z0 <= 8, "z0 must be in [1, 8]")
    val toks = split(textCol, " ")
    val m = (size(toks) - 1).cast("long")
    val greens = aggregate(
      sequence(lit(2), greatest(size(toks), lit(2))),
      lit(0L),
      (acc, i) => acc + when(
        pmod(gf.hash64(concat(
          element_at(toks, (i - 1).cast("int")), lit(":"),
          element_at(toks, i.cast("int")))), lit(2)) === 0, 1L)
        .otherwise(0L))
    val base = df.where(size(toks) >= 2)
      .select(groupCols.map(col) :+ m.as("__m") :+ greens.as("__g"): _*)
    val excess = lit(2) * col("__g") - col("__m") // 2g − m
    val z = excess.cast("double") /
      (lit(2.0) * sqrt(col("__m").cast("double") / 4.0))
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__m")).as("n_bigrams"),
        sum(col("__g")).as("n_green"),
        (gf.exact_sum(z) / count(lit(1))).as("mean_z"),
        sum((excess > 0 && excess * excess >
          lit(z0.toLong * z0) * col("__m")).cast("long"))
          .as("n_flagged"))
  }
}
