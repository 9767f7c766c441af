package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits for releasable datasets — the governance checks run
  * before a corpus (or its metadata tables) leaves the pipeline.
  *
  * k-anonymity: every combination of quasi-identifier values (an
  * "equivalence class") must cover at least k rows, otherwise those rows
  * are re-identifiable by joining the quasi-identifiers against outside
  * data. l-diversity strengthens it: within each class, the SENSITIVE
  * attribute must take at least l distinct values, otherwise membership
  * in a large class still leaks the sensitive value.
  *
  * Both audits are one class-keyed count shuffle (map-side combined) over
  * a projection of the quasi columns — corpus text never moves — plus a
  * single global fold over the class table (classes ≪ rows). Exact
  * integer counts end to end: engine-reproducible with no rounding.
  */
object Privacy {

  /** Equivalence classes: one row per quasi-identifier combination with
    * its size (and, when `sensitive` is given, its sensitive-value
    * diversity). NULL is a value like any other — classes with NULL
    * quasi-identifiers are still classes. */
  def equivalenceClasses(df: DataFrame, quasiCols: Seq[String],
      sensitive: Option[Column] = None): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val g = df.groupBy(quasiCols.map(col): _*)
    sensitive match {
      case None => g.agg(count(lit(1)).as("class_size"))
      case Some(s) => g.agg(count(lit(1)).as("class_size"),
        // NULL is a sensitive VALUE here too (consistent with the class-key
        // convention above): count_distinct skips NULLs, so add one when
        // the class contains any — {NULL, x} is diversity 2, all-NULL is 1.
        (count_distinct(s) +
          coalesce(max(when(s.isNull, 1L).otherwise(0L)), lit(0L)))
          .as("l_diversity"))
    }
  }

  /** One-row k-anonymity audit (optionally with l-diversity when a
    * sensitive column is supplied): class counts, the minimum class
    * size (= the dataset's actual k), and how many classes/rows violate
    * the `k` (and `l`) thresholds. `passes` is the release decision. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int,
      sensitive: Option[Column] = None, l: Int = 1): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(l >= 1, "l must be >= 1")
    val classes = equivalenceClasses(df, quasiCols, sensitive)
    val base = classes.agg(
      coalesce(sum("class_size"), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_classes"),
      coalesce(min("class_size"), lit(0L)).as("min_class_size"),
      coalesce(sum(when(col("class_size") < k, 1L).otherwise(0L)), lit(0L))
        .as("n_violating_classes"),
      coalesce(sum(when(col("class_size") < k, col("class_size"))
        .otherwise(0L)), lit(0L)).as("n_violating_rows"))
    sensitive match {
      case None =>
        base.withColumn("passes", col("n_violating_classes") === 0L)
      case Some(_) =>
        val d = classes.agg(
          coalesce(min("l_diversity"), lit(0L)).as("min_l_diversity"),
          coalesce(sum(when(col("l_diversity") < l, 1L).otherwise(0L)),
            lit(0L)).as("n_low_diversity_classes"))
        base.crossJoin(d)
          .withColumn("passes", col("n_violating_classes") === 0L &&
            col("n_low_diversity_classes") === 0L)
    }
  }

  /** The standard k-anonymization REPAIR: suppress (drop) every row in a
    * violating class. Generalization (coarsening quasi values) composes
    * upstream — bucket/truncate the columns, then audit again. */
  def suppressViolations(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ok = equivalenceClasses(df, quasiCols)
      .where(col("class_size") >= k).drop("class_size")
    // null-SAFE equality: a NULL-valued class that meets k is still a
    // legitimate class (a plain semi-join would silently drop it)
    val cond = quasiCols.map(c => df(c) <=> ok(c)).reduce(_ && _)
    df.join(ok, cond, "left_semi")
  }
}
