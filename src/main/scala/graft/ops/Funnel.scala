package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered conversion funnels over event streams.
  *
  * The product-analytics primitive a pipeline team reads before and
  * after every data change: of the entities that did step 1, how many
  * went on to do step 2 AFTER it, then step 3 after that — signup →
  * first query → retained, crawl-seen → fetched → parsed, prompt →
  * response → accepted. Matching is greedy earliest-completion (the
  * standard unordered-window funnel): t₁ = the entity's first step-1
  * event, t_k = its first step-k event at or after t_{k−1}. Greedy is
  * optimal here — taking the earliest feasible event can only leave
  * MORE room for later steps.
  */
object Funnel {

  /** Per-step funnel census. Returns one row per step:
    * (step, name, n_entities, rate_vs_first, rate_vs_prev) — rates are
    * NULL when their denominator is 0 (and vs_prev NULL on step 1).
    *
    * Scale shape: rows are filtered to funnel-step types up front and
    * reduced ENTITY-wise immediately — each of the K steps is one
    * (filter → join previous reached → min) pass where the join side
    * is entity-sized, never event-sized. Each reached frame is
    * localCheckpointed (it feeds the next step) and its census is
    * taken EAGERLY as a driver scalar — K bounded counts ARE the op's
    * whole output, the accepted bounded-collect class — so the
    * previous frame's blocks free deterministically instead of racing
    * a lazy downstream read. K is the funnel length (single digits),
    * not a data dimension. Duplicate events per (entity, step)
    * collapse in the min; NULL entities/timestamps are refused work. */
  def conversion(df: DataFrame, entityCol: Column, tsCol: Column,
      typeCol: Column, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    require(steps.toSet.size == steps.size, "steps must be distinct")
    val spark = df.sparkSession
    val base = df.select(entityCol.as("__e"), tsCol.as("__ts"),
        typeCol.as("__t"))
      .where(col("__e").isNotNull && col("__ts").isNotNull &&
        col("__t").isin(steps: _*))
      .localCheckpoint() // read once per step; funnel-step events only
    var reached = base.where(col("__t") === steps.head)
      .groupBy("__e").agg(min(col("__ts")).as("__tk"))
      .localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer(reached.count())
    steps.tail.foreach { name =>
      val prev = reached
      reached = base.where(col("__t") === name)
        .join(prev.select(col("__e"), col("__tk").as("__prev")),
          Seq("__e"))
        .where(col("__ts") >= col("__prev"))
        .groupBy("__e").agg(min(col("__ts")).as("__tk"))
        .localCheckpoint()
      counts += reached.count()
      CheckpointUtil.freeCheckpoint(prev)
    }
    CheckpointUtil.freeCheckpoint(reached)
    CheckpointUtil.freeCheckpoint(base)
    val first = counts.head
    val rows = steps.zipWithIndex.map { case (name, i) =>
      val n = counts(i)
      val vsFirst = if (first > 0) Some(n.toDouble / first) else None
      val vsPrev =
        if (i == 0) None
        else if (counts(i - 1) > 0) Some(n.toDouble / counts(i - 1))
        else None
      (i + 1, name, n, vsFirst, vsPrev)
    }
    import spark.implicits._
    rows.toDF("step", "name", "n_entities", "rate_vs_first",
      "rate_vs_prev")
  }

  /** Cohort retention matrix — [[conversion]]'s longitudinal
    * companion: entities are cohorted by the period of their FIRST
    * activity (periods are `periodDays`-day buckets counted from
    * `anchorDate`, a fixed anchor so period ids are reproducible
    * across runs and corpus growth), and each cell counts how many of
    * a cohort's entities were active again `offset` periods later.
    * The curve a pipeline team reads as "do users/sources/crawl hosts
    * that arrived in week W keep appearing".
    *
    * Scale shape: the event stream reduces to DISTINCT
    * (entity, period) immediately (one map-side-combined shuffle);
    * first-activity is a min over that entity-sized frame; the matrix
    * is one (cohort, offset) count over it. Offset 0 is the cohort
    * census itself (retention 1 by construction — kept as the
    * denominator receipt). NULL entities/timestamps are refused work.
    * Returns (cohort, offset, n_active, retention). */
  def retention(df: DataFrame, entityCol: Column, tsCol: Column,
      anchorDate: String, periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "periodDays must be >= 1")
    val period = floor(
      datediff(to_date(tsCol), to_date(lit(anchorDate))).cast("long")
        / periodDays)
    val ep = df
      .where(entityCol.isNotNull && tsCol.isNotNull)
      .select(entityCol.as("__e"), period.as("__p"))
      .distinct()
      .localCheckpoint() // feeds the first-activity min AND the matrix
    val firstP = ep.groupBy("__e").agg(min(col("__p")).as("__cohort"))
    val cells = ep.join(firstP, Seq("__e"))
      .groupBy(col("__cohort").as("cohort"),
        (col("__p") - col("__cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = cells.where(col("offset") === 0)
      .select(col("cohort"), col("n_active").as("__size"))
    cells.join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"),
        (col("n_active").cast("double") / col("__size")).as("retention"))
  }
}
