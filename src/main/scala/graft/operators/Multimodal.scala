package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north_star): media payloads are
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run as partition-local batch transforms.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries) behind [[StubCodec]] — a deterministic fake that derives
  * "features" from the payload bytes. The Spark-side plumbing — schema,
  * partition-local batching, output shape — is real and tested, and is what
  * matters at 100 TB: payloads never pass through a shuffle (featurize
  * before any wide op), and the binary column is pruned away the moment the
  * features are extracted.
  */
object Multimodal {

  /** Metadata struct carried alongside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),        // image | audio | video | text
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a payload+meta pair from a text column — the stand-in "media"
    * for tests (payload = UTF-8 bytes; kind derived from the id). */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("text").as("kind"), lit("text/plain").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")))

  /** ======= STUB CODEC =======
    * Deterministic fake decode: real deployments swap this object for one
    * backed by actual codecs (e.g. JNI image decoders) — the call sites and
    * batch shape stay identical. */
  object StubCodec {
    val featureDim = 8
    /** "Decode" payload bytes into a fixed-size float feature vector.
      * Deterministic rolling-hash over bytes, bucketed into featureDim. */
    def featurize(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](featureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % featureDim) = acc(i % featureDim) * 31 + (payload(i) & 0xff)
        i += 1
      }
      acc.map(v => ((v % 1000L).toFloat / 1000f))
    }
    /** "Frame-sample": byte-range slices standing in for video frames. */
    def frameSample(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty) Seq.empty
      else (0 until n).map { i =>
        val start = (payload.length.toLong * i / n).toInt
        val end = (payload.length.toLong * (i + 1) / n).toInt
        java.util.Arrays.copyOfRange(payload, start, math.max(end, start + 1)
          .min(payload.length))
      }
    }
    /** "Resize": deterministic re-sampling of payload bytes to a target
      * byte budget (stride-sampled when shrinking, cycle-padded when
      * growing) — stands in for pixel resampling. */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
      if (payload.isEmpty || targetBytes <= 0) Array.emptyByteArray
      else Array.tabulate(targetBytes) { i =>
        payload((payload.length.toLong * i / targetBytes).toInt % payload.length)
      }
    }
  }

  /** Partition-local featurization: mapPartitions over (id, payload) batches
    * — the Scala analogue of a pandas-UDF `mapInPandas` stage. Binary data
    * stays inside its input partition; output is narrow (id + features) so
    * downstream shuffles never move payload bytes. */
  def featurize(spark: SparkSession, df: DataFrame, idCol: String,
                payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        (id, bytes.length, StubCodec.featurize(bytes))
      }
    }.toDF(idCol, "byte_len", "features")
  }

  /** Frame sampling: each payload expands partition-locally to `n`
    * (id, frame_idx, frame) rows — a video becomes n image-ish payloads
    * WITHOUT the parent payload ever crossing a shuffle; downstream
    * featurize runs per frame. Output stays binary + narrow metadata. */
  def frameSample(spark: SparkSession, df: DataFrame, idCol: String, n: Int,
                  payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        StubCodec.frameSample(bytes, n).zipWithIndex.map {
          case (frame, idx) => (id, idx, frame)
        }
      }
    }.toDF(idCol, "frame_idx", "frame")
  }

  /** Resize: partition-local payload re-sampling to a byte budget, with
    * the metadata struct updated to the target dimensions. The payload
    * column is REPLACED (old bytes are never carried alongside) so the
    * narrowest schema flows downstream. */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
             targetBytes: Int, payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        (id, StubCodec.resize(bytes, targetBytes))
      }
    }.toDF(idCol, payloadCol)
  }
}
