package graft.util

import org.apache.spark.sql.SparkSession

/** Filesystem checks through the Hadoop FileSystem API. `java.io.File`
  * is only correct for bare local paths and silently answers `false`
  * for `hdfs://`/`s3a://` stores — for a store-existence probe that
  * gates an overwrite sink, that false re-bootstraps (and destroys)
  * state on every batch at deployment scale.
  */
object Fs {

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Immediate subdirectories of `dir` that contain a `_SUCCESS` marker —
    * the committed partitions of a per-batch parquet store. A reader that
    * globs every file instead would transiently include a crashed batch's
    * partial part-files until the replay overwrites them.
    */
  def committedSubdirs(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(d => fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS")))
      .map(_.toString)
  }
}
