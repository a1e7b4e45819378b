package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, plus a partition-local decode/feature-extract stage.
  * (The reference has no media types; its `varbinary` + function surface —
  * COMMON/type/StandardTypes.java:47, VarbinaryFunctions.java — is the seed.
  * On Spark the pattern is: binary column + metadata struct + mapPartitions
  * batch decode.)
  *
  * The fixture has no real media, so `payload` is the UTF-8 document text
  * reinterpreted as opaque bytes and STUB_DECODE is a deterministic fake —
  * the Spark-side plumbing (schema, typed Dataset, partition-local batched
  * decode, no driver collection) is the real, tested part. A production
  * deployment swaps `stubDecode` for an image/audio codec invoked once per
  * partition (amortizing codec init), keeping everything else unchanged.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata (media_type/width/height
    * derived deterministically so tests are stable). */
  case class MediaAsset(doc_id: Long, media_type: String, payload: Array[Byte],
    width: Int, height: Int)

  /** Extracted features; produced partition-locally by `decodeFeatures`. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
    byte_checksum: Long, n_frames: Long, brightness: Double)

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** documents → media assets: payload = raw bytes; media_type cycles
    * image/audio/video; fake dimensions from md5 (SQL-reproducible). */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        element_at(
          typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (expr("cast(conv(substring(md5(concat(cast(doc_id AS STRING), ':w')), 1, 4), 16, 10) AS INT)")
          % 1920 + 1).as("width"),
        (expr("cast(conv(substring(md5(concat(cast(doc_id AS STRING), ':h')), 1, 4), 16, 10) AS INT)")
          % 1080 + 1).as("height"))
      .as[MediaAsset]
  }

  /** STUB_DECODE: stands in for a real codec (libjpeg/ffmpeg are not in this
    * container). Deterministic pure function of the bytes so the pipeline is
    * testable end-to-end; same signature a real decoder would have. */
  private def stubDecode(a: MediaAsset): MediaFeatures = {
    var checksum = 0L
    var i = 0
    while (i < a.payload.length) {
      checksum = (checksum * 131 + (a.payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    val brightness =
      if (a.payload.isEmpty) 0.0
      else a.payload.map(b => (b & 0xff).toDouble).sum / a.payload.length / 255.0
    MediaFeatures(a.doc_id, a.media_type, a.payload.length.toLong, checksum,
      n_frames = a.payload.length / 1024L + 1L,
      // HALF_UP at 4 decimals — the same rounding convention as every
      // ROUND(...,4) oracle column (rint's HALF_EVEN is not what SQL
      // ROUND does on either engine)
      brightness = math.floor(brightness * 10000 + 0.5) / 10000)
  }

  /** Partition-local batched decode: one iterator pass per partition (where
    * a real codec would be initialized once), emitting a typed features
    * Dataset. No shuffle, no driver collection — scales with partitions. */
  def decodeFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // codec init would happen here, once per partition
      it.map(stubDecode)
    }
  }

  /** Metadata projection — pure SQL surface over the binary column
    * (octet_length etc.), oracle-checkable. */
  def metadata(s: SparkSession, dir: String): DataFrame =
    assets(s, dir).toDF()
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("doc_id")

  /** Feature extraction through the mapPartitions decode path (rows-only
    * gate: the stub decoder is engine-side logic, not SQL). */
  def features(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(assets(s, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("byte_checksum"), col("n_frames"), col("brightness"))
      .orderBy("doc_id")

  /** Frame sampling: pick 5 evenly-spaced frame indices per video asset
    * (frame = 1 KiB payload block here; a real pipeline seeks the codec to
    * the same offsets). Pure arithmetic over the binary column's length →
    * oracle-checkable; the explode is partition-local (no shuffle). */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    assets(s, dir).toDF()
      .filter(col("media_type") === "video")
      .withColumn("n_frames", (length(col("payload")) / 1024 + 1).cast("long"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0L), lit(4L))).as(Seq("pos", "i")))
      .withColumn("fi", floor(col("i") * col("n_frames") / 5).cast("long"))
      .select(col("doc_id"),
        (col("i") + 1).cast("long").as("sample_no"),
        col("fi").as("frame_idx"),
        (col("fi") * 1024).cast("long").as("byte_offset"))
      .orderBy("doc_id", "sample_no")

  final case class MediaResized(doc_id: Long, media_type: String,
      width: Int, height: Int, out_w: Long, out_h: Long, resized_sig: String)

  /** STUB_RESIZE: aspect-preserving fit into a 224-box with pure integer
    * math (floor division), signature = md5 over payload + output
    * geometry — the deterministic stand-in for resized bytes a real
    * libjpeg/Pillow stage would emit. Same mapPartitions shape as
    * [[decodeFeatures]]: codec init once per partition, no shuffle. */
  private def stubResize(a: MediaAsset): MediaResized = {
    val (ow, oh) =
      if (a.width >= a.height) (224L, a.height.toLong * 224 / a.width)
      else (a.width.toLong * 224 / a.height, 224L)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(a.payload)
    md.update(s":${ow}x$oh".getBytes("UTF-8"))
    MediaResized(a.doc_id, a.media_type, a.width, a.height, ow, oh,
      md.digest().map("%02x".format(_)).mkString.substring(0, 16))
  }

  def resize(s: SparkSession, dir: String): DataFrame = {
    val as = assets(s, dir)
    import as.sparkSession.implicits._
    as.mapPartitions(_.map(stubResize)).toDF()
      .select(col("doc_id"), col("media_type"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("out_w"), col("out_h"), col("resized_sig"))
      .orderBy("doc_id")
  }

  final case class InferScore(doc_id: Long, score: Long)

  /** Batched model inference — the GPU-embedding shape of a multimodal
    * pipeline: the "model" loads once per PARTITION, rows feed it in
    * fixed-size batches (one forward pass per 32 assets), outputs are
    * strictly per-row so any partitioning/batching yields identical
    * results (the invariance a resumable 100 TB inference job needs;
    * LlmOpsSpec pins it). The stub model scores from the decoded
    * checksum — deterministic byte math the oracle replays. */
  def batchInferOn(as: Dataset[MediaAsset]): DataFrame = {
    import as.sparkSession.implicits._
    as.mapPartitions { it =>
      // model init happens here, once per partition
      it.grouped(32).flatMap { batch =>
        // one forward pass per batch
        batch.map { a =>
          val f = stubDecode(a)
          InferScore(a.doc_id, (f.byte_checksum * 31 + f.n_bytes) % 1000003L)
        }
      }
    }.toDF().orderBy("doc_id")
  }

  def batchInfer(s: SparkSession, dir: String): DataFrame =
    batchInferOn(assets(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_resize" -> resize,
    "mm_batch_infer" -> batchInfer,
    "mm_metadata" -> metadata,
    "mm_features" -> features,
    "mm_frame_sample" -> frameSample)

  val oracle: Map[String, String] = Map(
    "mm_resize" ->
      """WITH a AS (SELECT doc_id,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
        |      AS media_type,
        |    text,
        |    CAST('0x' || substr(md5(doc_id::VARCHAR || ':w'), 1, 4) AS BIGINT)
        |      % 1920 + 1 AS width,
        |    CAST('0x' || substr(md5(doc_id::VARCHAR || ':h'), 1, 4) AS BIGINT)
        |      % 1080 + 1 AS height
        |  FROM documents),
        |r AS (SELECT doc_id, media_type, width, height, text,
        |    CASE WHEN width >= height THEN 224
        |         ELSE width * 224 // height END AS out_w,
        |    CASE WHEN width >= height THEN height * 224 // width
        |         ELSE 224 END AS out_h
        |  FROM a)
        |SELECT doc_id, media_type,
        |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |  CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
        |  substr(md5(text || ':' || out_w || 'x' || out_h), 1, 16)
        |    AS resized_sig
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm_batch_infer" ->
      """WITH b AS (SELECT doc_id, hex(CAST(text AS BLOB)) h,
        |        octet_length(CAST(text AS BLOB)) n
        |       FROM documents),
        |v AS (SELECT doc_id, n,
        |       list_transform(range(n), i ->
        |         CAST('0x' || substr(h, CAST(i * 2 + 1 AS INT), 2) AS BIGINT))
        |        bytes
        |      FROM b),
        |f AS (SELECT doc_id, n,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT), bytes),
        |         (acc, x) -> (acc * 131 + x) % 1000000007) AS cks
        |      FROM v)
        |SELECT doc_id, CAST((cks * 31 + n) % 1000003 AS BIGINT) AS score
        |FROM f ORDER BY doc_id""".stripMargin,
    "mm_metadata" ->
      """SELECT doc_id,
        | ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | CAST(CAST('0x' || substr(md5(doc_id::VARCHAR || ':w'), 1, 4) AS BIGINT)
        |   % 1920 + 1 AS BIGINT) AS width,
        | CAST(CAST('0x' || substr(md5(doc_id::VARCHAR || ':h'), 1, 4) AS BIGINT)
        |   % 1080 + 1 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id,
        | CAST(i + 1 AS BIGINT) AS sample_no,
        | CAST(i * nf // 5 AS BIGINT) AS frame_idx,
        | CAST((i * nf // 5) * 1024 AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) // 1024 + 1 AS nf
        |      FROM documents WHERE doc_id % 3 = 2),
        | unnest(range(0, 5)) AS u(i)
        |ORDER BY doc_id, sample_no""".stripMargin,
    // mm_features: the STUB_DECODE arithmetic is deterministic byte math
    // (polynomial checksum base 131 mod 1e9+7, mean-byte brightness), so
    // the oracle replays it from the hex expansion of the payload
    "mm_features" ->
      """WITH b AS (SELECT doc_id, hex(CAST(text AS BLOB)) h,
        |        octet_length(CAST(text AS BLOB)) n
        |       FROM documents),
        |v AS (SELECT doc_id, n,
        |       list_transform(range(n), i ->
        |         CAST('0x' || substr(h, CAST(i * 2 + 1 AS INT), 2) AS BIGINT))
        |        bytes
        |      FROM b)
        |SELECT doc_id,
        | ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        | CAST(n AS BIGINT) AS n_bytes,
        | list_reduce(list_prepend(CAST(0 AS BIGINT), bytes),
        |   (acc, x) -> (acc * 131 + x) % 1000000007) AS byte_checksum,
        | CAST(n // 1024 + 1 AS BIGINT) AS n_frames,
        | floor(list_sum(bytes) * 1.0 / n / 255.0 * 10000 + 0.5) / 10000
        |  AS brightness
        |FROM v ORDER BY doc_id""".stripMargin
  )
}
