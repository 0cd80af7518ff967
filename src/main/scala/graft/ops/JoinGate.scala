package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Plan-build-time join-strategy gates — turning measured deployment
  * knobs into CODE (the [[Triangles]] `broadcastEdgeLimit` pattern).
  *
  * Motivating measurement (BASELINE.md r13, text-dedup family): at
  * decade scale the AQE-chosen borderline broadcast of the df/size
  * side tables (~8 MB) under a ~27M-row shingle probe is a 4×
  * pessimization — 367 s default vs 90 s all-SMJ — because the
  * broadcast plan rebuilds and re-probes the hash relation under heavy
  * memory pressure, while at the bench SFs the same broadcasts WIN.
  * Pinning `spark.sql.autoBroadcastJoinThreshold=-1` per deployment was
  * the r13 footnote; this object makes the flip structural: the query
  * builder inspects the on-disk size of its input ONCE (driver-side
  * file metadata, no job) and attaches `shuffle_merge` hints to the
  * side tables above the gate. Hints live in the logical plan, so both
  * the static planner and AQE re-planning honor them — no session conf.
  */
object JoinGate {

  /** Sum of the on-disk bytes feeding `df` (driver metadata only — no
    * Spark job). Unresolvable inputs (in-memory frames, checkpoints,
    * files racing a concurrent delete) count 0: the gate then stays in
    * the bench-SF regime, which is the safe default.
    */
  def inputBytes(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.iterator.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      } catch { case _: java.io.IOException => 0L }
    }.sum
  }

  /** Gate for the text-dedup side-table joins. 32 MB of documents
    * parquet sits between the largest broadcast-wins instance measured
    * (sf1.0, 5.6 MB) and the broadcast-loses one (sf10, 57 MB) with a
    * decade of headroom on either side; the shingle probe under the
    * side tables is ~500× the documents byte count, so above the gate
    * the probe is far past where a rebuilt-per-partition broadcast
    * relation can win.
    */
  val TextDedupSmjBytes: Long = 32L << 20

  /** True when `docs` (the documents scan feeding a text-dedup query)
    * is decade-scale: its side-table joins should be sort-merge.
    */
  def textDedupSmj(docs: DataFrame): Boolean =
    inputBytes(docs) > TextDedupSmjBytes

  /** A df/size side table under the gate: hinted `shuffle_merge` above
    * the gate (structural all-SMJ), left to AQE below it (broadcasts
    * win at bench SFs).
    */
  def sideTable(df: DataFrame, smj: Boolean): DataFrame =
    if (smj) df.hint("shuffle_merge") else df

  /** A side table that is EXPLICITLY broadcast below the gate (where
    * post-checkpoint stats are opaque to AQE and the broadcast is a
    * measured win) but degrades to sort-merge above it.
    */
  def broadcastUnless(df: DataFrame, smj: Boolean): DataFrame =
    if (smj) df.hint("shuffle_merge") else broadcast(df)
}
