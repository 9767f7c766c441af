package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-width binary framing for token-id sequences — the payload
  * format of a tokenized-corpus [[RecordShards]] layout (gate q218's
  * end-to-end contract): 8-byte big-endian document id, then 8 bytes per
  * token id. Pure built-in expressions (hex/unhex/substr) in BOTH
  * directions, so framing and parsing stay inside whole-stage codegen
  * and never leave the scan.
  *
  * Fixed-width over varint: ids are read by position (no carry-chain),
  * the record length alone gives the token count, and a corrupted byte
  * cannot desynchronize the rest of the record — the right trade for
  * training shards, where storage sits behind compression anyway.
  * Ids must be non-negative (token ids are). */
object IdRecords {

  /** Frame (id, ids) as one binary record. Empty id sequences frame as
    * the bare 8-byte document id.
    *
    * Linear in the token count: each id renders to its 16-char hex limb
    * independently, `array_join` assembles the hex string once, and ONE
    * `unhex` materializes the bytes. (A binary fold —
    * `aggregate(ids, unhex(lpad(hex(id),16,'0')), concat)` — re-copies
    * the accumulated buffer per token: O(L²) bytes moved, ~67 MB of
    * copying to frame a 4096-token document. Framing is the hot
    * tokenize→shard path, so the quadratic constant matters at training
    * sequence lengths.) */
  def encodeRecord(id: Column, ids: Column): Column =
    unhex(concat(
      lpad(hex(id), 16, "0"),
      array_join(transform(ids, x => lpad(hex(x), 16, "0")), "")))

  /** The document id of a [[encodeRecord]] frame. */
  def decodeId(record: Column): Column =
    conv(hex(record.substr(lit(1), lit(8))), 16, 10).cast("long")

  /** The token ids of a [[encodeRecord]] frame (empty array for a
    * bare-id record). */
  def decodeIds(record: Column): Column =
    // sequence(1, 0) counts DOWN — guard the empty-ids record
    when(octet_length(record) > 8,
      transform(
        sequence(lit(1), ((octet_length(record) - 8) / 8).cast("int")),
        i => conv(hex(record.substr(i * 8 + 1, lit(8))), 16, 10)
          .cast("long")))
      .otherwise(array().cast("array<long>"))
}
