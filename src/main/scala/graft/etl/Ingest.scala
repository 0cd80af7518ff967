package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ingest-order ordinal shared by the file readers (S1-S3).
  *
  * pandas keep-first dedup (ref `etl.py:451-488`) means FILE order. The
  * previous implementation used bare `monotonically_increasing_id()`,
  * which encodes (partitionId, offset-in-partition) — correct for a
  * single file, but for a DIRECTORY input Spark packs file splits into
  * partitions sorted by SIZE (descending), so partition order — and with
  * it the "first" row a dedup keeps — follows file size, not file name.
  * A re-run after one file grows can flip keep-first winners.
  *
  * The stable notion of ingest order at any scale is (file, offset).
  * This ordinal materializes it as an orderable struct:
  *
  *   1. `_metadata.file_path`   — lexicographic file order (how pandas
  *      users read a directory: sorted glob);
  *   2. `_metadata.file_block_start` — split offset within the file, for
  *      files large enough to be split across partitions;
  *   3. `monotonically_increasing_id()` — arrival order WITHIN a block
  *      (one block is read sequentially by one task, so mid order there
  *      IS byte order; across blocks/files fields 1-2 decide first).
  *
  * Struct ordering in Spark is field-lexicographic, so `orderBy(_ord)`
  * in the keep-first windows needs no change. The `_metadata` column is
  * supported by every file source in use (csv, text, xml, parquet).
  */
object Ingest {
  def ordinal: Column = struct(
    col("_metadata.file_path").as("file"),
    col("_metadata.file_block_start").as("block"),
    monotonically_increasing_id().as("seq"))
}
