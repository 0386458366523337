package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Sources

/** Multimodal-column plumbing: opaque binary payloads alongside relational
  * dimensions, with typed metadata and a batched decode/feature-extract
  * stage.
  *
  * The real decode (image/audio codecs) is STUBBED — those libraries are not
  * in this container — behind [[FakeDecoder]], a deterministic stand-in.
  * Everything Spark-side is real and tested: the schema (binary payload +
  * metadata struct), the partition-preserving `mapPartitions` batch shape
  * (the Scala analog of `mapInPandas` — one iterator per partition so a real
  * decoder amortizes model/codec setup per batch, not per row), and the
  * downstream feature schema.
  *
  * Scale notes: payloads never shuffle — metadata extraction and decoding
  * are map-only; only the (small) extracted features flow into joins or
  * aggregations.  For 100 TB of media, partition by source/date so decode
  * failures re-run a partition, not the corpus.
  */
object Multimodal {

  /** The corpus as a multimodal table: binary payload + typed metadata.
    * (Text bytes stand in for image/audio payloads.) */
  def payloadTable(spark: SparkSession, dir: String): DataFrame =
    Sources.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source"), col("lang"),
        octet_length(col("text")).as("n_bytes"),
        lit("text/plain").as("mime")).as("meta"))

  /** Metadata extraction query — checked against DuckDB (md5 of the same
    * bytes, chunk count of the same payload). */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    payloadTable(spark, dir).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      ceil(col("meta.n_bytes") / lit(256.0)).cast("int").as("n_chunks"),
      col("meta.mime").as("mime"))

  val metadataOracle: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  CAST(CEIL(octet_length(encode(text)) / 256.0) AS INT) AS n_chunks,
      |  'text/plain' AS mime
      |FROM documents""".stripMargin

  /** Deterministic stand-in for a media decoder: "decodes" a payload into a
    * fixed-dimension feature vector from its bytes.  A real deployment
    * replaces ONLY this function (e.g. JNI image codec / ONNX encoder); the
    * batch plumbing around it is unchanged.
    *
    * Numerics are chosen so the features are EXACT: each lane accumulates
    * its bytes as integers (lane `l` takes payload positions `l, l+8, …`),
    * then scales by the power of two 1/256 — a long below 2²⁴ converts to
    * float losslessly and the division only shifts the exponent, so every
    * feature is an exactly-representable float and an independent engine
    * can reproduce it from the bytes alone (see [[featureSummaryOracle]]).
    * Exactness holds for payloads under ~512 KiB (2²⁴·8/255 bytes); the
    * corpus documents are well under that. */
  object FakeDecoder {
    val FeatureDim = 8

    def decode(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](FeatureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % FeatureDim) += (payload(i) & 0xff)
        i += 1
      }
      val out = new Array[Float](FeatureDim)
      var l = 0
      while (l < FeatureDim) {
        out(l) = acc(l) / 256.0f
        l += 1
      }
      out
    }

    /** "Resize": deterministic downsample keeping every `stride`-th byte —
      * the stand-in for an image rescale; a real codec replaces only this. */
    def resize(payload: Array[Byte], stride: Int = 2): Array[Byte] = {
      val out = new Array[Byte]((payload.length + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = payload(i * stride); i += 1 }
      out
    }

    val FrameLen = 64
    val FrameStep = 4

    /** "Frame sampling": fixed [[FrameLen]]-byte frames, keeping every
      * [[FrameStep]]-th — the stand-in for video keyframe extraction.
      * Returns (frame index, frame bytes); the last frame may be short. */
    def sampleFrames(payload: Array[Byte]): Seq[(Int, Array[Byte])] = {
      val frames = Seq.newBuilder[(Int, Array[Byte])]
      var f = 0
      while (f * FrameLen < payload.length) {
        frames += f -> payload.slice(f * FrameLen,
          math.min((f + 1) * FrameLen, payload.length))
        f += FrameStep
      }
      frames.result()
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Batched decode: one [[FakeDecoder]] "session" per partition, rows
    * streamed through it — the mapInPandas batch shape in Scala. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    payloadTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // Per-partition setup happens HERE in a real decoder (codec init,
        // model load); the iterator below is the per-batch hot path.
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = FakeDecoder.decode(payload)
          Row(r.getAs[Long]("doc_id"), payload.length, feats.toSeq)
        }
      }(enc)
  }

  /** Feature summary — per-doc feature squared norm.  Although the features
    * come out of the `mapPartitions` decoder (not SQL), [[FakeDecoder]]'s
    * integer-exact numerics make the summary a pure function of the payload
    * bytes, so this IS oracle-checkable (round-3 verdict, stretch item). */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir).selectExpr(
      "doc_id", "n_bytes",
      "size(features) AS feature_dim",
      """round(aggregate(features, 0D,
        | (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 6) AS feature_sq_norm""".stripMargin)

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("resized_bytes", IntegerType, nullable = false),
    StructField("resized_md5", StringType, nullable = false)))

  /** Batched "resize" over the payloads — the image-rescale analog, same
    * partition-preserving mapPartitions shape as [[decodeFeatures]]; only
    * the (small) resized digest leaves the stage, payloads never shuffle. */
  def resized(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizeSchema)
    payloadTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // One digest instance per partition (digest() resets it per use) —
        // the same per-partition-setup slot a real codec would occupy.
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val small = FakeDecoder.resize(payload)
          Row(r.getAs[Long]("doc_id"), payload.length, small.length,
            Multimodal.hex(md.digest(small)))
        }
      }(enc)
  }

  private[llm] def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** DuckDB mirror of [[resized]] (ASCII corpus — see
    * [[featureSummaryOracle]]): every 2nd byte is every 2nd char, and
    * md5 of the sampled string hashes the same bytes. */
  val resizedOracle: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  octet_length(encode(sampled)) AS resized_bytes,
      |  md5(sampled) AS resized_md5
      |FROM (
      |  SELECT doc_id, text,
      |    array_to_string(list_transform(
      |      generate_series(1, length(text), 2),
      |      i -> substr(text, i, 1)), '') AS sampled
      |  FROM documents) t""".stripMargin

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_len", IntegerType, nullable = false),
    StructField("frame_md5", StringType, nullable = false)))

  /** Batched frame sampling — the video-keyframe analog: one payload row
    * explodes to its sampled frames inside the partition (a flatMap, so
    * frames of one payload never cross partitions). */
  def frameSamples(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    payloadTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val docId = r.getAs[Long]("doc_id")
          FakeDecoder.sampleFrames(r.getAs[Array[Byte]]("payload")).map {
            case (idx, bytes) => Row(docId, idx, bytes.length,
              Multimodal.hex(md.digest(bytes)))
          }
        }
      }(enc)
  }

  /** DuckDB mirror of [[frameSamples]]: frame f covers 1-based char
    * positions [f·64+1, f·64+64]; sampled indices are 0, 4, 8, … while
    * f·64 < length. */
  val frameSamplesOracle: String = {
    val (flen, step) = (FakeDecoder.FrameLen, FakeDecoder.FrameStep)
    s"""SELECT doc_id, CAST(f AS INT) AS frame_idx,
       |  octet_length(encode(fr)) AS frame_len, md5(fr) AS frame_md5
       |FROM (
       |  SELECT doc_id, f, substr(text, f * $flen + 1, $flen) AS fr
       |  FROM documents,
       |    LATERAL UNNEST(generate_series(0,
       |      CAST(ceil(length(text) / $flen.0) AS INT) - 1, $step)) u(f)) t""".stripMargin
  }

  /** DuckDB mirror of [[featureSummary]]: the corpus is ASCII (verified:
    * `octet_length(encode(text)) = length(text)` over every scale), so
    * `ascii(substr(text, p, 1))` enumerates payload bytes; lane `l` sums
    * byte positions `l+1, l+9, …` (1-based) exactly in BIGINT, scales by
    * the double 1/256 (exact — see [[FakeDecoder]]), and the squared norm
    * folds the 8 lane squares left-to-right like Spark's `aggregate`.
    * Each lane square has ≤48 significant bits (lane values carry ≤24), so
    * the squares themselves are exact and only the final 8-term sum
    * rounds — identically in both engines given the same order. */
  val featureSummaryOracle: String = {
    def lane(l: Int): String =
      s"""(CAST(COALESCE(list_sum(list_transform(
         |  generate_series(${l + 1}, octet_length(encode(text)), ${FakeDecoder.FeatureDim}),
         |  p -> ascii(substr(text, p, 1)))), 0) AS DOUBLE) / 256.0)""".stripMargin
    val sq = (0 until FakeDecoder.FeatureDim)
      .map(l => s"${lane(l)} * ${lane(l)}").mkString("\n  + ")
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS n_bytes,
       |  CAST(${FakeDecoder.FeatureDim} AS INT) AS feature_dim,
       |  round($sq, 6) AS feature_sq_norm
       |FROM documents""".stripMargin
  }
}
