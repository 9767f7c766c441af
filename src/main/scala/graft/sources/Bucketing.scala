package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the shuffle eliminator.
  *
  * At 100 TB the expensive part of a recurring fact⋈fact join is not the
  * join, it's re-shuffling both inputs on every run. Writing each side ONCE
  * as a table hash-bucketed on the join key makes every later equi-join /
  * groupBy on that key exchange-free: Spark's scan reports
  * HashPartitioning(key, n), EnsureRequirements sees matching outputs, and
  * the join runs bucket-local (`.explain` shows zero Exchange nodes —
  * asserted in BucketingSpec). `sortBy` additionally pre-sorts each bucket
  * file so sort-merge joins can skip their sort when files-per-bucket is 1.
  *
  * Uses Spark's native bucketing (Murmur3 pmod, the same layout
  * spark.sql.sources.bucketing reads back) rather than a custom scheme, so
  * any Spark reader benefits — no lock-in to this library.
  */
object Bucketing {

  /** Write `df` as an EXTERNAL parquet table bucketed (and bucket-sorted)
    * on `key` — registered as `table` in the session catalog, data at
    * `path`. Overwrites both. Bucket count must match on both sides of a
    * co-located join (use the same `numBuckets` for tables joined often). */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      path: String, key: String, numBuckets: Int,
      sorted: Boolean = true): Unit = {
    require(numBuckets > 0, "numBuckets must be > 0")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.format("parquet").option("path", path)
      .bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).mode("overwrite").saveAsTable(table)
  }
}
