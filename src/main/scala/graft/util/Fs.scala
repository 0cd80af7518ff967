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
}
