package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * partition-parallel pass with a real schema contract.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub (`fakeDecodeFeatures`); everything
  * around it — binary column handling, schema, batch-shaped mapPartitions,
  * partition sizing — is the real 100 TB design: media bytes never hit the
  * driver, each partition streams its blobs through the decoder, and
  * metadata (byte size, content hash, mime guess) is computed with
  * codegen'd expressions before the expensive decode so corrupt/oversized
  * payloads can be filtered early.
  */
object Multimodal {

  /** Documents-as-binary view: the corpus text re-encoded as UTF-8 blobs
    * stands in for image/audio payloads (same column shape: id + binary +
    * metadata). */
  def binaryView(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
        col("source").as("origin"),
        lit("text/plain").as("mime")).as("meta"))

  /** STUB — stands in for a real image/audio decoder (no codec libs in
    * this container). Deterministic fake: 4 "features" derived from byte
    * statistics. The seam (Iterator[Row] => Iterator[Row], executed per
    * partition) is exactly where a JNI/onnx decoder would slot in. */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    var s0 = 0L; var s1 = 0L
    var i = 0
    while (i < payload.length) {
      s0 += payload(i) & 0xff
      s1 += (payload(i) & 0xff).toLong * ((i % 97) + 1)
      i += 1
    }
    val n = math.max(payload.length, 1)
    Array(payload.length.toDouble, s0.toDouble / n, (s1 % 10007).toDouble,
      ((s0 ^ s1) % 4093).toDouble)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Partition-parallel decode pass (mapPartitions, batch-shaped): the
    * Scala equivalent of a `mapInPandas` decode UDF. */
  def decodeFeatures(binary: DataFrame): DataFrame = {
    val spark = binary.sparkSession
    val rdd = binary.select("media_id", "payload", "meta.n_bytes").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
            fakeDecodeFeatures(payload))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  def defs: Seq[QueryDef] = Seq(
    // Binary metadata extraction — expression-level (no decode), oracle-
    // checked: byte length + sha256 + mime routing.
    QueryDef.sql(
      "mm_binary_meta",
      """SELECT doc_id AS media_id,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  sha256(text) AS payload_sha, 'text/plain' AS mime
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      binaryView(Tables.documents(s, d)).select(
        col("media_id"),
        col("meta.n_bytes").as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"),
        col("meta.mime").as("mime"))
        .orderBy("media_id")
    },

    // Frame sampling: fixed-offset byte windows from each payload (the
    // video-frame / audio-clip sampling shape: k offsets per blob, never
    // the whole payload downstream), hashed for verification. Byte
    // windows on the Spark side, character windows in the oracle — equal
    // because the corpus is ASCII; real media bytes would keep the
    // Spark-side semantics and drop the SQL oracle.
    QueryDef.sql(
      "mm_frame_sample",
      """SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
        |  md5(substring(text, CAST(1 + i*100 AS INTEGER), 16)) AS frame_md5
        |FROM documents, generate_series(0, 2) t(i)
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      binaryView(Tables.documents(s, d))
        .select(col("media_id"), posexplode(array((0 until 3).map(i =>
          md5(expr(s"substring(payload, ${1 + i * 100}, 16)"))): _*)))
        .select(col("media_id"), col("pos").cast("int").as("frame_idx"),
          col("col").as("frame_md5"))
        .orderBy("media_id", "frame_idx")
    },

    // Stubbed decode + feature extraction through the partition-parallel
    // seam. The fake decoder is plain byte arithmetic and the corpus is
    // ASCII (byte i == codepoint of char i+1), so the oracle replicates
    // it exactly — proving the mapPartitions seam itself, not just the
    // stub, preserves row identity and values. A real JNI/onnx decoder
    // would drop the oracle and keep the seam. MultimodalSpec pins the
    // stub's outputs independently.
    QueryDef.sql(
      "mm_decode_features",
      """SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
        |  round(CAST(s0 AS DOUBLE) / greatest(length(text), 1), 4) AS mean_byte,
        |  CAST(s1 % 10007 AS DOUBLE) AS weighted_mod
        |FROM (
        |  SELECT doc_id, text,
        |    coalesce(list_sum(list_transform(range(1, length(text)+1),
        |      i -> CAST(unicode(text[i]) AS BIGINT))), 0) AS s0,
        |    coalesce(list_sum(list_transform(range(1, length(text)+1),
        |      i -> CAST(unicode(text[i]) AS BIGINT) * (((i-1) % 97) + 1))), 0) AS s1
        |  FROM documents)
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      decodeFeatures(binaryView(Tables.documents(s, d)))
        .select(col("media_id"), col("n_bytes"),
          round(element_at(col("features"), 2), 4).as("mean_byte"),
          element_at(col("features"), 3).as("weighted_mod"))
        .orderBy("media_id")
    },

    // ViT-style patch extraction: tile the WHOLE payload into 64-byte
    // patches with raster-order grid coordinates (4 patches per pretend
    // row) — the tokenization step of an image-transformer ingest, where
    // each patch becomes one input token. Unlike mm_frame_sample (fixed
    // probe offsets), this is the complete tiling: the tail patch is
    // clipped, never padded, and n_bytes records the clip. Narrow
    // ~len/64 fan-out, no shuffle before the sink. Byte windows on the
    // Spark side, char windows in the oracle — equal on the ASCII
    // corpus.
    QueryDef.sql(
      "mm_image_patches",
      """SELECT doc_id AS media_id, CAST(pi AS INTEGER) AS patch_idx,
        |  CAST(pi // 4 AS INTEGER) AS prow, CAST(pi % 4 AS INTEGER) AS pcol,
        |  CAST(length(substring(text, CAST(1 + pi*64 AS INTEGER), 64)) AS INTEGER) AS n_bytes,
        |  md5(substring(text, CAST(1 + pi*64 AS INTEGER), 64)) AS patch_md5
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(range(0, greatest(CAST(ceil(length(text) / 64.0) AS BIGINT), 1))) AS pi
        |  FROM documents)
        |ORDER BY media_id, patch_idx""".stripMargin) { (s, d) =>
      val nPatches = greatest(
        ceil(length(col("payload")).cast("double") / 64.0).cast("bigint"), lit(1L))
      binaryView(Tables.documents(s, d))
        .select(col("media_id"), col("payload"),
          posexplode(sequence(lit(0L), nPatches - 1)))
        .select(col("media_id"), col("col").cast("int").as("patch_idx"),
          floor(col("col") / 4).cast("int").as("prow"),
          pmod(col("col"), lit(4)).cast("int").as("pcol"),
          length(expr("substring(payload, CAST(1 + col*64 AS INT), 64)"))
            .cast("int").as("n_bytes"),
          md5(expr("substring(payload, CAST(1 + col*64 AS INT), 64)"))
            .as("patch_md5"))
        .orderBy("media_id", "patch_idx")
    },

    // Audio-shaped feature extraction: the payload interpreted as 8-bit
    // PCM (centered at 64), windowed into 160-sample frames, each frame
    // reduced to energy (Σ s²) + zero-crossing count — the classic VAD /
    // silence-trim features, through the SAME partition-parallel decode
    // seam as mm_decode_features (a real pipeline would swap the byte
    // interpretation for an actual codec and keep the window/feature
    // shape). All features are exact integers, so the oracle replays the
    // arithmetic verbatim — no float anywhere. The tail window is
    // clipped, never padded (n_samples records it).
    QueryDef.sql(
      "mm_audio_energy",
      """SELECT doc_id AS media_id, CAST(wi AS INTEGER) AS window_idx,
        |  CAST(length(w) AS INTEGER) AS n_samples,
        |  CAST(coalesce(list_sum(list_transform(range(1, length(w) + 1),
        |    i -> CAST((unicode(w[i]) - 64) * (unicode(w[i]) - 64)
        |      AS BIGINT))), 0) AS BIGINT) AS energy,
        |  CAST(coalesce(list_sum(list_transform(range(1, length(w)),
        |    i -> CASE WHEN (unicode(w[i]) - 64) * (unicode(w[i+1]) - 64) < 0
        |      THEN 1 ELSE 0 END)), 0) AS INTEGER) AS zero_crossings
        |FROM (
        |  SELECT doc_id, wi,
        |    substring(text, CAST(1 + wi*160 AS INTEGER), 160) AS w
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(range(0, greatest(CAST(ceil(length(text) / 160.0)
        |        AS BIGINT), 1))) AS wi
        |    FROM documents))
        |ORDER BY media_id, window_idx""".stripMargin) { (s, d) =>
      audioWindowFeatures(binaryView(Tables.documents(s, d)), win = 160)
        .orderBy("media_id", "window_idx")
    },

    // Scene-cut detection on the video-shaped payload: frames = 256-byte
    // windows through the SAME decode seam (a real pipeline swaps in a
    // codec and keeps the frame/feature shape), per-frame integer energy,
    // and a cut wherever consecutive-frame energy jumps by ≥ 50000 — the
    // shot-boundary primitive behind frame-sampling curricula. One lag
    // window PER MEDIA (shuffle keyed by media_id; frames of one medium
    // sort locally), all-integer features ⇒ the oracle replays verbatim.
    QueryDef.sql(
      "mm_scene_cut",
      """WITH fr AS (
        |  SELECT doc_id AS media_id, CAST(wi AS INTEGER) AS frame_idx,
        |    CAST(coalesce(list_sum(list_transform(range(1, length(w) + 1),
        |      i -> CAST((unicode(w[i]) - 64) * (unicode(w[i]) - 64)
        |        AS BIGINT))), 0) AS BIGINT) AS energy
        |  FROM (
        |    SELECT doc_id, wi,
        |      substring(text, CAST(1 + wi*256 AS INTEGER), 256) AS w
        |    FROM (
        |      SELECT doc_id, text,
        |        unnest(range(0, greatest(CAST(ceil(length(text) / 256.0)
        |          AS BIGINT), 1))) AS wi
        |      FROM documents)))
        |SELECT media_id, frame_idx, energy,
        |  energy - lag(energy) OVER w AS d_energy,
        |  CAST(abs(energy - lag(energy) OVER w) >= 50000 AS INTEGER)
        |    AS is_cut
        |FROM fr WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("frame_idx")
      audioWindowFeatures(binaryView(Tables.documents(s, d)), win = 256)
        .select(col("media_id"), col("window_idx").as("frame_idx"),
          col("energy"))
        .withColumn("d_energy", col("energy") - lag("energy", 1).over(w))
        .withColumn("is_cut",
          (abs(col("d_energy")) >= 50000).cast("int"))
        .orderBy("media_id", "frame_idx")
    },

    // Near-duplicate media by shared patch hashes: the mm_image_patches
    // tiling, distinct patch digests per media, pairs generated PER
    // PATCH BUCKET with boilerplate patches dropped by a deterministic
    // cap (a patch shared by > 16 media is template content, not
    // duplication signal — the LSH stop-shingle convention), then pairs
    // sharing ≥ 3 patches scored by patch-set Jaccard. Never all-pairs:
    // the bucket join is bounded by cap² per patch.
    QueryDef.sql(
      "mm_patch_dedup",
      """WITH patches AS (
        |  SELECT DISTINCT doc_id AS media_id,
        |    md5(substring(text, CAST(1 + pi*64 AS INTEGER), 64)) AS ph
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(range(0, greatest(CAST(ceil(length(text) / 64.0)
        |        AS BIGINT), 1))) AS pi
        |    FROM documents)),
        |np AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS np
        |       FROM patches GROUP BY media_id),
        |keep AS (
        |  SELECT ph FROM patches GROUP BY ph HAVING COUNT(*) <= 16),
        |pairs AS (
        |  SELECT a.media_id AS ma, b.media_id AS mb,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM patches a
        |  JOIN keep USING (ph)
        |  JOIN patches b ON a.ph = b.ph AND a.media_id < b.media_id
        |  GROUP BY a.media_id, b.media_id
        |  HAVING COUNT(*) >= 3)
        |SELECT ma, mb, shared,
        |  round(CAST(shared AS DOUBLE) / (na.np + nb.np - shared), 4)
        |    AS patch_jaccard
        |FROM pairs JOIN np na ON pairs.ma = na.media_id
        |JOIN np nb ON pairs.mb = nb.media_id
        |ORDER BY ma, mb""".stripMargin) { (s, d) =>
      val nPatches = greatest(
        ceil(length(col("payload")).cast("double") / 64.0).cast("bigint"),
        lit(1L))
      val patches = graft.CacheRegistry.register(
        binaryView(Tables.documents(s, d))
          .select(col("media_id"), col("payload"),
            explode(sequence(lit(0L), nPatches - 1)).as("pi"))
          .select(col("media_id"),
            md5(expr("substring(payload, CAST(1 + pi*64 AS INT), 64)"))
              .as("ph"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val np = patches.groupBy("media_id").agg(count(lit(1)).as("np"))
      val keep = patches.groupBy("ph").agg(count(lit(1)).as("bs"))
        .filter(col("bs") <= 16).select("ph")
      val pairs = patches.join(keep, "ph")
        .select(col("ph"), col("media_id").as("ma"))
        .join(patches.select(col("ph"), col("media_id").as("mb")), "ph")
        .filter(col("ma") < col("mb"))
        .groupBy("ma", "mb").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
      pairs
        .join(broadcast(np.select(col("media_id").as("ma"),
          col("np").as("npa"))), "ma")
        .join(broadcast(np.select(col("media_id").as("mb"),
          col("np").as("npb"))), "mb")
        .select(col("ma"), col("mb"), col("shared"),
          round(col("shared").cast("double")
            / (col("npa") + col("npb") - col("shared")), 4)
            .as("patch_jaccard"))
        .orderBy("ma", "mb")
    }
  )

  val audioWindowSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("window_idx", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("zero_crossings", IntegerType, nullable = false)))

  /** Windowed PCM-style features via the partition-parallel seam (see
    * mm_audio_energy). Samples are (byte & 0xff) - 64; per window:
    * energy = Σ s², zero crossings = adjacent strict sign flips. */
  def audioWindowFeatures(binary: DataFrame, win: Int): DataFrame = {
    val spark = binary.sparkSession
    val rdd = binary.select("media_id", "payload").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getAs[Long]("media_id")
        val payload = r.getAs[Array[Byte]]("payload")
        val nWin = math.max((payload.length + win - 1) / win, 1)
        (0 until nWin).iterator.map { wi =>
          val from = wi * win
          val until = math.min(from + win, payload.length)
          var energy = 0L
          var zc = 0
          var prev = 0
          var i = from
          while (i < until) {
            val sVal = (payload(i) & 0xff) - 64
            energy += sVal.toLong * sVal
            if (i > from && prev * sVal < 0) zc += 1
            prev = sVal
            i += 1
          }
          Row(id, wi, math.max(until - from, 0), energy, zc)
        }
      }
    }
    spark.createDataFrame(rdd, audioWindowSchema)
  }
}
