package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct beside them, and
  * decode/feature steps run partition-wise so one task amortizes decoder
  * setup over a whole batch of rows (the same batching contract a Pandas
  * UDF / mapInPandas pipeline uses on the Python side — here it's
  * `mapPartitions` over a typed Dataset, the Scala-native equivalent).
  *
  * The container has no image/audio codecs, so [[MediaCodec]] is a
  * clearly-marked STUB with a deterministic fake decode; everything
  * around it — schema, batch shape, partitioning, feature layout — is the
  * real engineering surface and is tested in MultimodalSpec.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      format: String,
      features: Array[Float])

  /** STUB decoder boundary. A real deployment swaps this object for one
    * backed by an actual codec (e.g. javax.imageio / ffmpeg bindings);
    * the signatures are the contract. The fake is deterministic in the
    * payload bytes so the pipeline is testable end-to-end.
    */
  object MediaCodec {
    /** STUB: "decode" = byte-histogram-derived features (deterministic). */
    def decodeToFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** STUB: resize would re-encode; the fake truncates/pads the payload
      * to the byte budget implied by the target box.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, w * h)

    /** STUB: frame sampling for video payloads — every nth byte stands in
      * for every nth frame.
      */
    def sampleFrames(payload: Array[Byte], everyN: Int): Array[Byte] =
      payload.zipWithIndex.collect { case (b, i) if i % everyN == 0 => b }
  }

  /** Synthesize a deterministic media table from any id+text source —
    * payload bytes derived from md5 so every engine/test run agrees.
    * `repeatTimesSql` scales payload length (a SQL expression over the
    * source columns, e.g. "doc_id % 5 + 1") for ops that need
    * variable-length streams; both mm queries and their oracles derive
    * from THIS one format/payload convention.
    */
  def synthesize(docs: DataFrame, idCol: String, textCol: String,
      repeatTimesSql: String = "1"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      unhex(expr(s"repeat(md5($textCol), CAST(($repeatTimesSql) AS INT))"))
        .as("media"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (col(idCol) % 3 + 1).cast("int")).as("format"),
      (col(idCol) % 64 + 1).cast("int").as("width"),
      (col(idCol) % 48 + 1).cast("int").as("height"))

  final case class FrameRow(media_id: Long, media: Array[Byte], format: String)

  /** Partition-wise frame sampling — every-Nth-frame selection through
    * the same batched decode boundary as [[extractFeatures]] (the stub
    * treats every Nth byte as every Nth frame; a real codec samples
    * keyframes). Returns (media_id, format, n_sampled).
    */
  def sampleFrameCounts(media: DataFrame, everyN: Int)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select("media_id", "media", "format").as[FrameRow]
      .mapPartitions { rows =>
        // null payload → zero frames, never an NPE (the EdgeCaseSpec
        // contract every operator honors)
        rows.map(r => (r.media_id, r.format,
          if (r.media == null) 0
          else MediaCodec.sampleFrames(r.media, everyN).length))
      }.toDF("media_id", "format", "n_sampled")
  }

  /** 64-bit average-hash perceptual fingerprint: decode to a 64-bin
    * feature vector (through the same codec boundary as
    * [[extractFeatures]]), set each bit where the bin exceeds the mean.
    * The classic aHash construction — near-identical media differ in few
    * bits, so the SAME pigeonhole hamming search that dedups text
    * SimHashes ([[SimHash.hammingPairs]]) dedups images/audio. Null or
    * empty payloads return null (no bits to compare — they'd otherwise
    * all collide at distance 0, the SimHash empty-shingle failure mode).
    */
  def aHash(payload: Array[Byte]): java.lang.Long = {
    if (payload == null || payload.isEmpty) return null
    val f = MediaCodec.decodeToFeatures(payload, 64)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += f(i); i += 1 }
    mean /= 64
    var h = 0L
    i = 0
    while (i < 64) { if (f(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** Perceptual near-duplicate media pairs (hamming(aHash) ≤ maxDist):
    * one decode pass for signatures, then bucketed candidate search —
    * payloads never pairwise-compared, the 100 TB contract.
    */
  def phashNearDup(media: DataFrame, maxDist: Int = 3): DataFrame = {
    val hashUdf = udf((p: Array[Byte]) => aHash(p))
    SimHash.hammingPairs(
      media.select(col("media_id"), hashUdf(col("media")).as("sig"))
        .filter(col("sig").isNotNull),
      "media_id", "sig", maxDist)
  }

  /** Aspect-preserving resize plan: for each image, the target (tw, th)
    * fitting a `box`×`box` budget with the aspect ratio kept, plus the
    * `bucketPx`-pixel size bucket the row batches into. ALL integer
    * arithmetic (`(side · box) div long_side` — no FP, so a DuckDB twin
    * replays it exactly). Vision preprocessing at scale is bucketed
    * exactly like this: a decode/resize batch wants same-shaped tensors,
    * so rows group by target-size bucket BEFORE the expensive decode —
    * the relational plan here is the shuffle key; [[resizeTo]] is the
    * partition-wise byte path that consumes it.
    */
  def resizePlan(media: DataFrame, box: Int = 224,
      bucketPx: Int = 32): DataFrame =
    media.filter(col("format").isin("png", "jpeg"))
      .withColumn("_ls", greatest(col("width"), col("height")))
      .withColumn("tw", expr(s"(width * $box) div _ls").cast("int"))
      .withColumn("th", expr(s"(height * $box) div _ls").cast("int"))
      .withColumn("bw", expr(s"tw div $bucketPx").cast("int"))
      .withColumn("bh", expr(s"th div $bucketPx").cast("int"))
      .drop("_ls")

  /** Partition-wise resize through the stub codec boundary: one decoder
    * setup per partition, rows arrive pre-bucketed by [[resizePlan]]'s
    * (bw, bh) shuffle key in a real pipeline. Returns (media_id, tw, th,
    * out_bytes); null payloads produce 0 bytes, never an NPE.
    */
  def resizeTo(media: DataFrame, box: Int = 224)
      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    resizePlan(media, box)
      .select("media_id", "media", "tw", "th")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, tw, th) =>
          val out =
            if (payload == null) Array.empty[Byte]
            else MediaCodec.resize(payload, tw, th)
          (id, tw, th, out.length)
        }
      }.toDF("media_id", "tw", "th", "out_bytes")
  }

  /** Partition-wise feature extraction — the mapInPandas-equivalent
    * batched decode. Decoder init happens once per partition, not per
    * row; partition sizing (spark.sql.files.maxPartitionBytes) is the
    * batch-size knob at scale.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8)
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media", "format", "width", "height")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (once per batch)
        rows.map { r =>
          val payload = if (r.media == null) Array.empty[Byte] else r.media
          MediaFeatures(r.media_id, payload.length, r.format,
            MediaCodec.decodeToFeatures(payload, dims))
        }
      }
  }
}
