package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tokenizer-model layouts — the train-once/encode-many
  * decoupling every production tokenization job needs (the q206
  * stored-index pattern applied to the three tokenizer families): a 100 TB
  * encode runs as MANY independent shard jobs over weeks, and each must
  * load the SAME frozen model artifact rather than re-learn (or even
  * re-rank an alphabet from its shard, which would silently fork the id
  * space between shards).
  *
  * Layout under `dir` (one subdir per table, parquet):
  *  - BPE: `merges/` (ord INT, left, right, freq) — order IS the model;
  *  - unigram: `vocab/` (piece, count, score, piece_id) — exactly the
  *    q199 gate surface, so a stored model is directly auditable;
  *  - WordPiece: `vocab/` (piece, piece_id);
  *  - all: `meta/` one row carrying the family tag + the geometry the
  *    apply side needs (maxPieceLen / maxContentLen) — load re-derives
  *    NOTHING from any corpus, and refuses a layout written by a
  *    different family rather than misreading it.
  *
  * Models are vocabulary-sized (KBs to MBs) — each table coalesces to one
  * file; determinism comes from the explicit ord/piece_id columns, never
  * from file order. Round-trip contract (gated the q15 sketch way):
  * encode under a loaded model is bit-identical to encode under the
  * in-session model. */
object TokenizerStore {

  private def writeMeta(spark: SparkSession, dir: String, family: String,
      geometry: Int, alphabet: String = "char"): Unit = {
    import spark.implicits._
    Seq((family, geometry, alphabet)).toDF("family", "geometry", "alphabet")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMetaRow(spark: SparkSession, dir: String,
      family: String): org.apache.spark.sql.Row = {
    val df = spark.read.parquet(s"$dir/meta")
    val m = df.head
    val got = m.getAs[String]("family")
    require(got == family,
      s"$dir holds a '$got' tokenizer layout, not '$family'")
    m
  }

  private def readMeta(spark: SparkSession, dir: String,
      family: String): Int =
    readMetaRow(spark, dir, family).getAs[Int]("geometry")

  /** Delete a layout sub-table if present (used to scrub stale state on
    * re-save); goes through the Hadoop FileSystem so object-store-backed
    * dirs behave like local ones. */
  private def deleteIfExists(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Persist an ordered BPE merge list. `alphabet` records which base
    * split the merges were learned over — "char" ([[Bpe.learnMerges]])
    * or "byte" ([[Bpe.learnMergesBytes]]/[[Bpe.encodeBytes]], whose id
    * space needs no corpus pass at all). The tag is trainer state:
    * continuation training MUST replay the table over the same alphabet
    * (a byte-mode table folded over char symbols diverges silently on
    * any non-ASCII corpus), so [[continueBpe]] dispatches on it. */
  def saveBpe(spark: SparkSession, merges: Seq[Bpe.Merge],
      dir: String, alphabet: String = "char"): Unit = {
    require(alphabet == "char" || alphabet == "byte",
      s"alphabet must be 'char' or 'byte', got '$alphabet'")
    import spark.implicits._
    merges.zipWithIndex
      .map { case (m, i) => (i, m.left, m.right, m.freq) }
      .toDF("ord", "left", "right", "freq")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    writeMeta(spark, dir, "bpe", merges.size, alphabet)
  }

  /** The alphabet tag of a [[saveBpe]] layout ("char" for layouts
    * written before the tag existed). */
  def loadBpeAlphabet(spark: SparkSession, dir: String): String = {
    val m = readMetaRow(spark, dir, "bpe")
    if (m.schema.fieldNames.contains("alphabet"))
      m.getAs[String]("alphabet")
    else "char"
  }

  /** Continue BPE merge learning from a stored layout: loads the merge
    * table AND its alphabet tag, replays under the matching base split
    * ([[Bpe.learnMergesContinue]] / [[Bpe.learnMergesBytesContinue]]),
    * and returns the FULL extended merge list (stored ++ new) ready to
    * re-save. The safe continuation entry point — callers cannot pick
    * the wrong alphabet because the store carries it. */
  def continueBpe(spark: SparkSession, dir: String, corpus: DataFrame,
      textCol: String, k: Int): Seq[Bpe.Merge] = {
    val existing = loadBpe(spark, dir)
    val fresh = loadBpeAlphabet(spark, dir) match {
      case "byte" =>
        Bpe.learnMergesBytesContinue(corpus, textCol, existing, k)
      case _ => Bpe.learnMergesContinue(corpus, textCol, existing, k)
    }
    existing ++ fresh
  }

  /** Load a [[saveBpe]] layout in its exact learned order. */
  def loadBpe(spark: SparkSession, dir: String): Seq[Bpe.Merge] = {
    val k = readMeta(spark, dir, "bpe")
    val rows = spark.read.parquet(s"$dir/merges")
      .orderBy("ord").collect()
      .map(r => Bpe.Merge(r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[Long]("freq")))
    require(rows.length == k,
      s"$dir/merges holds ${rows.length} merges, meta records $k — " +
        "partial or corrupted layout")
    rows.toSeq
  }

  /** Persist a unigram-LM model (pieces, EM counts, integer-scaled
    * scores, ids — the full q199 surface). */
  def saveUnigram(spark: SparkSession, model: Unigram.Model,
      dir: String): Unit = {
    import spark.implicits._
    model.entries.map(e => (e.piece, e.count, e.score, e.id))
      .toDF("piece", "count", "score", "piece_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    writeMeta(spark, dir, "unigram", model.maxPieceLen)
  }

  /** Load a [[saveUnigram]] layout; entries come back in piece-id order
    * so the model is byte-identical to the one saved. */
  def loadUnigram(spark: SparkSession, dir: String): Unigram.Model = {
    val maxPieceLen = readMeta(spark, dir, "unigram")
    val entries = spark.read.parquet(s"$dir/vocab")
      .orderBy("piece_id").collect()
      .map(r => Unigram.PieceEntry(r.getAs[String]("piece"),
        r.getAs[Long]("count"), r.getAs[Long]("score"),
        r.getAs[Long]("piece_id")))
    require(entries.nonEmpty, s"$dir/vocab is empty")
    Unigram.Model(entries.toIndexedSeq, maxPieceLen)
  }

  /** Persist a WordPiece model (piece, piece_id). Pass `merges` to also
    * store the ordered merge table — required if the layout should
    * support [[Wordpiece.learnMergesContinue]] later (the vocab alone
    * cannot reconstruct trainer state). */
  def saveWordpiece(spark: SparkSession, model: Wordpiece.Model,
      dir: String, merges: Seq[Wordpiece.Merge] = Nil): Unit = {
    import spark.implicits._
    model.entries.toDF("piece", "piece_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    if (merges.nonEmpty)
      merges.zipWithIndex
        .map { case (m, i) => (i, m.left, m.right, m.merged, m.freq) }
        .toDF("ord", "left", "right", "merged", "freq")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    else
      // Re-saving a merge-less model into a previously-used dir must not
      // leave the OLD merge table behind — loadWordpieceMerges would
      // silently return trainer state inconsistent with the new vocab.
      deleteIfExists(spark, s"$dir/merges")
    writeMeta(spark, dir, "wordpiece", model.maxContentLen)
  }

  /** Load the merge table of a [[saveWordpiece]] layout written with
    * merges — the continuation-training entry point. */
  def loadWordpieceMerges(spark: SparkSession,
      dir: String): Seq[Wordpiece.Merge] = {
    readMeta(spark, dir, "wordpiece")
    val p = new org.apache.hadoop.fs.Path(s"$dir/merges")
    require(p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(p),
      s"$dir was saved without merges — the vocab alone cannot " +
        "reconstruct trainer state (re-save with the merges argument)")
    spark.read.parquet(s"$dir/merges")
      .orderBy("ord").collect()
      .map(r => Wordpiece.Merge(r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("freq")))
      .toSeq
  }

  /** Persist a reserved special-token block next to a model layout (any
    * family): `$dir/specials` (piece, id), id = block position. The
    * offset every consumer of the layout's id space must apply is part
    * of the MODEL, so it lives in the store — two shard jobs reading
    * the same layout can never disagree on where content ids start. */
  def saveSpecials(spark: SparkSession, dir: String,
      specials: SpecialTokens): Unit = {
    import spark.implicits._
    specials.pieces.zipWithIndex.map { case (p, i) => (p, i.toLong) }
      .toDF("piece", "id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/specials")
  }

  /** Load a [[saveSpecials]] block; None for a layout written without
    * one (content ids start at 0, the pre-reservation convention). */
  def loadSpecials(spark: SparkSession,
      dir: String): Option[SpecialTokens] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/specials")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      None
    else Some(SpecialTokens(
      spark.read.parquet(s"$dir/specials").orderBy("id").collect()
        .map(_.getAs[String]("piece")).toVector))
  }

  /** Load a [[saveWordpiece]] layout. */
  def loadWordpiece(spark: SparkSession, dir: String): Wordpiece.Model = {
    val maxContentLen = readMeta(spark, dir, "wordpiece")
    val entries = spark.read.parquet(s"$dir/vocab")
      .orderBy("piece_id").collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("piece_id")))
    require(entries.nonEmpty, s"$dir/vocab is empty")
    Wordpiece.Model(entries.toIndexedSeq, maxContentLen)
  }
}
