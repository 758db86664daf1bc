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

  /** e3-scaled integer DCT-II coefficient table for the 16→8 transform:
    * K(u,r) = round(1000·cos(π(2r+1)u/32)), u∈[0,8), r∈[0,16). Rendered
    * from this ONE definition into both engines (the q_ewma_forecast
    * pre-rounded-weight recipe), so the 2D DCT below is exact integer
    * arithmetic everywhere — no libm call at query time in either
    * engine. */
  private val dctK: Seq[(Int, Int, Long)] =
    for { u <- 0 until 8; r <- 0 until 16 }
      yield (u, r,
        math.round(1000.0 * math.cos(math.Pi * (2 * r + 1) * u / 32.0)))

  private val dctKValuesSql: String =
    dctK.map { case (u, r, kv) => s"($u, $r, $kv)" }.mkString(", ")

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
    },

    // ------------------------------------------------------------------
    // PERCEPTUAL media near-dup (r12 verdict ask #3): mm_patch_dedup
    // keys on exact 64-byte digests, so a re-encoded/requantized
    // duplicate — which shares ZERO exact patches — escapes it. This is
    // the standard fix: a DCT perceptual hash (pHash). Luma proxy = the
    // first 256 payload bytes as a 16×16 grid (0-padded); integer 8×8
    // 2D DCT via the pre-rounded e3 coefficient table [[dctK]]
    // (separable: row pass then column pass, two broadcast joins + two
    // map-side-combined aggregates); hash bit(u,v) = D(u,v) > 0 (sign
    // bits — balanced on real content, unlike mean-threshold bits which
    // collapse under the DC term), packed into two 32-bit halves so no
    // engine ever shifts into the sign bit. Each media also gets a
    // REQUANTIZED variant (byte → (b div 4)·4, the JPEG-requant
    // stand-in; media_id·2+kind keys the union). Candidate pairs come
    // from the dedup_simhash pigeonhole recipe widened to the measured
    // band: 6 disjoint chunks (11/11/10/11/11/10 bits) guarantee every
    // Hamming-≤5 pair shares a chunk (measured requant distance ≤5 at
    // every SF, cross-media p1 = 21 — a 4× gap), with a deterministic
    // 64-per-bucket boilerplate cap (observed max 15 — replayed by the
    // oracle, same class contract as mm_patch_dedup's stop-patch rule).
    // Output per media: both fingerprints (hash-certifying the integer
    // DCT end-to-end), the requant Hamming distance, whether the BANDED
    // join caught the requant pair, and the shared-exact-patch count
    // (0 ⇒ patch dedup provably blind to this duplicate). SCALE: pixel
    // fan-out is a fixed 512 rows/media; everything joins against the
    // 128-row broadcast table; the pair join is band-bucket-bounded.
    QueryDef.sql(
      "mm_phash_dedup",
      s"""WITH kt AS (SELECT * FROM (VALUES $dctKValuesSql) t(u, r, kv)),
        |px AS (
        |  SELECT doc_id, kind, i, i // 16 AS r, i % 16 AS c,
        |    CASE WHEN kind = 1 THEN (p0 // 4) * 4 ELSE p0 END AS p
        |  FROM (
        |    SELECT doc_id, k.kind, t.i,
        |      CASE WHEN length(w) >= t.i + 1
        |           THEN CAST(unicode(substring(w, CAST(t.i + 1 AS INTEGER), 1))
        |                AS BIGINT)
        |           ELSE 0 END AS p0
        |    FROM (SELECT doc_id, substring(text, 1, 256) AS w FROM documents),
        |      generate_series(0, 255) t(i),
        |      (SELECT unnest([0, 1]) AS kind) k)),
        |rstage AS (
        |  SELECT doc_id, kind, kt.u, px.c,
        |    CAST(SUM(px.p * kt.kv) AS BIGINT) AS rv
        |  FROM px JOIN kt ON kt.r = px.r
        |  GROUP BY 1, 2, 3, 4),
        |dstage AS (
        |  SELECT doc_id, kind, rs.u, kt.u AS v,
        |    CAST(SUM(rs.rv * kt.kv) AS BIGINT) AS dv
        |  FROM rstage rs JOIN kt ON kt.r = rs.c
        |  GROUP BY 1, 2, 3, 4),
        |fp AS (
        |  SELECT doc_id, kind,
        |    CAST(COALESCE(SUM(CASE WHEN dv > 0 AND u*8 + v < 32
        |      THEN CAST(1 AS BIGINT) << (u*8 + v) ELSE 0 END), 0)
        |      AS BIGINT) AS fp_lo,
        |    CAST(COALESCE(SUM(CASE WHEN dv > 0 AND u*8 + v >= 32
        |      THEN CAST(1 AS BIGINT) << (u*8 + v - 32) ELSE 0 END), 0)
        |      AS BIGINT) AS fp_hi
        |  FROM dstage GROUP BY 1, 2),
        |ch AS (
        |  SELECT doc_id*2 + kind AS mid, fp_lo, fp_hi, t.ci,
        |    CASE t.ci WHEN 0 THEN fp_lo & 2047
        |              WHEN 1 THEN (fp_lo >> 11) & 2047
        |              WHEN 2 THEN (fp_lo >> 22) & 1023
        |              WHEN 3 THEN fp_hi & 2047
        |              WHEN 4 THEN (fp_hi >> 11) & 2047
        |              ELSE (fp_hi >> 22) & 1023 END AS cv
        |  FROM fp, generate_series(0, 5) t(ci)),
        |bucketok AS (
        |  SELECT ci, cv FROM ch GROUP BY ci, cv HAVING COUNT(*) <= 64),
        |hp AS (
        |  SELECT ma, mb FROM (
        |    SELECT DISTINCT a.mid AS ma, b.mid AS mb, a.fp_lo AS lo_a,
        |      a.fp_hi AS hi_a, b.fp_lo AS lo_b, b.fp_hi AS hi_b
        |    FROM ch a JOIN bucketok USING (ci, cv)
        |    JOIN ch b ON a.ci = b.ci AND a.cv = b.cv AND a.mid < b.mid)
        |  WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) <= 5),
        |base AS (
        |  SELECT o.doc_id AS media_id,
        |    o.fp_hi AS fp_hi_o, o.fp_lo AS fp_lo_o,
        |    r.fp_hi AS fp_hi_r, r.fp_lo AS fp_lo_r,
        |    CAST(bit_count(xor(o.fp_lo, r.fp_lo)) +
        |         bit_count(xor(o.fp_hi, r.fp_hi)) AS INTEGER) AS hamming
        |  FROM fp o JOIN fp r ON o.doc_id = r.doc_id
        |    AND o.kind = 0 AND r.kind = 1),
        |caught AS (
        |  SELECT ma // 2 AS media_id FROM hp
        |  WHERE mb = ma + 1 AND ma % 2 = 0),
        |pat AS (
        |  SELECT doc_id, kind, i // 64 AS pi,
        |    md5(string_agg(CAST(p AS VARCHAR), '-' ORDER BY i)) AS ph
        |  FROM px GROUP BY 1, 2, 3),
        |shp AS (
        |  SELECT a.doc_id, CAST(COUNT(DISTINCT a.ph) AS BIGINT)
        |    AS shared_patches
        |  FROM (SELECT DISTINCT doc_id, ph FROM pat WHERE kind = 0) a
        |  JOIN (SELECT DISTINCT doc_id, ph FROM pat WHERE kind = 1) b
        |    ON a.doc_id = b.doc_id AND a.ph = b.ph
        |  GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_total FROM hp)
        |SELECT b.media_id, b.fp_hi_o, b.fp_lo_o, b.fp_hi_r, b.fp_lo_r,
        |  b.hamming,
        |  CAST(c.media_id IS NOT NULL AS INTEGER) AS caught,
        |  COALESCE(s.shared_patches, 0) AS shared_patches,
        |  t.n_pairs_total
        |FROM base b
        |LEFT JOIN caught c USING (media_id)
        |LEFT JOIN shp s ON s.doc_id = b.media_id, tot t
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      // Media frame: one row per (doc, kind) — the requant variant is a
      // kind flag, never a materialized copy. Pixels are computed INLINE
      // from the window string wherever needed (Spark's substring
      // returns '' past the end and ascii('') = 0, which IS the
      // zero-padding rule), so no 512-rows/media pixel frame ever
      // materializes — the first plan's pixel explode + two 8×-exploded
      // broadcast joins benched 13.0 s at sf0.1; this shape is ~2 s.
      // One PIXEL ARRAY per (doc, kind) row, computed in a single pass
      // and persisted (10k rows × 1 KB): every downstream consumer reads
      // pixels with O(1) element_at. The first shape recomputed
      // ascii(substring(w, i, 1)) per use — substring re-scans the
      // string per call, which made the row pass 5 G byte-ops (7.4 s at
      // sf0.1, measured by stage bisect); this is ~20× less. Spark's
      // substring returns '' past the end and ascii('') = 0, which IS
      // the zero-padding rule; the requant variant is applied to the
      // array once, never a materialized media copy.
      // repartition BEFORE the pixel decode: the corpus arrives as one
      // parquet split, and the decode (an interpreted higher-order
      // transform) is CPU-bound per row — without the spread it runs on
      // ONE core (the simhashPairs fingerprint rule)
      val docsW = graft.CacheRegistry.ensurePersisted(
        Tables.documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 256).as("w"))
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            explode(array(lit(0), lit(1))).as("kind"), col("w"))
          .select(col("doc_id"), col("kind"),
            when(col("kind") === 1, expr(
              "transform(sequence(1, 256)," +
                " i -> (ascii(substring(w, i, 1)) div 4) * 4)"))
              .otherwise(expr(
                "transform(sequence(1, 256), i -> ascii(substring(w, i, 1)))"))
              .as("pv")))
      // Separable 2D DCT with the coefficient table folded into literal
      // expressions — no join, no pixel shuffle (integer addition is
      // order-independent, so this is value-identical to the oracle's
      // row/column two-pass): per (doc, kind, column c), the 8 row-pass
      // values R(u,c) = Σ_r K(u,r)·p(16r+c) are one codegen'd linear
      // combination each; the column pass D(u,v) = Σ_c R(u,c)·K(v,c) is
      // 64 fused sums in one map-side-combined aggregate over the
      // 16-rows/media frame.
      val kByU: Map[Int, Array[Long]] = dctK.groupBy(_._1)
        .map { case (u, rows) =>
          u -> rows.sortBy(_._2).map(_._3).toArray
        }
      val rCols = (0 until 8).map { u =>
        expr((0 until 16).map { r =>
          s"(${kByU(u)(r)}) * CAST(pv[16 * $r + c] AS BIGINT)"
        }.mkString(" + ")).as(s"r_$u")
      }
      val rstage = docsW
        .select(col("doc_id") +: col("kind") +: col("pv") +:
          explode(sequence(lit(0), lit(15))).as("c") +: Seq.empty: _*)
        .select(Seq(col("doc_id"), col("kind"), col("c")) ++ rCols: _*)
      val dAggs = for (u <- 0 until 8; v <- 0 until 8) yield
        sum(col(s"r_$u") *
          element_at(lit(kByU(v)), col("c").cast("int") + 1))
          .cast("bigint").as(s"d_${u}_$v")
      def packBits(range: Range, base: Int) = range.map { idx =>
        when(col(s"d_${idx / 8}_${idx % 8}") > 0, 1L << (idx - base))
          .otherwise(0L)
      }.reduce(_ + _)
      val fp = graft.CacheRegistry.register(rstage
        .groupBy("doc_id", "kind")
        .agg(dAggs.head, dAggs.tail: _*)
        .select(col("doc_id"), col("kind"),
          packBits(0 until 32, 0).cast("bigint").as("fp_lo"),
          packBits(32 until 64, 32).cast("bigint").as("fp_hi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val ch = fp
        .select((col("doc_id") * 2 + col("kind")).as("mid"),
          col("fp_lo"), col("fp_hi"),
          explode(sequence(lit(0), lit(5))).as("ci"))
        .withColumn("cv", expr(
          """CASE ci WHEN 0 THEN fp_lo & 2047
            |        WHEN 1 THEN shiftright(fp_lo, 11) & 2047
            |        WHEN 2 THEN shiftright(fp_lo, 22) & 1023
            |        WHEN 3 THEN fp_hi & 2047
            |        WHEN 4 THEN shiftright(fp_hi, 11) & 2047
            |        ELSE shiftright(fp_hi, 22) & 1023 END""".stripMargin))
      // ch is a cheap 6-row fan-out of the PERSISTED 10k-row fp frame —
      // recomputing it per consumer is cheaper than another persist job
      // (this query's floor is orchestration, not data)
      val bucketok = ch.groupBy("ci", "cv")
        .agg(count(lit(1)).as("bs")).filter(col("bs") <= 64)
        .select("ci", "cv")
      val hp = graft.CacheRegistry.ensurePersisted(
        ch.join(bucketok, Seq("ci", "cv"))
          .select(col("ci"), col("cv"), col("mid").as("ma"),
            col("fp_lo").as("lo_a"), col("fp_hi").as("hi_a"))
          .join(ch.select(col("ci"), col("cv"), col("mid").as("mb"),
            col("fp_lo").as("lo_b"), col("fp_hi").as("hi_b")),
            Seq("ci", "cv"))
          .filter(col("ma") < col("mb"))
          .select("ma", "mb", "lo_a", "hi_a", "lo_b", "hi_b")
          .distinct()
          .filter(bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
            bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) <= 5)
          .select("ma", "mb"))
      // both kinds' fingerprints per media via ONE pivot aggregation
      // (a self-join of fp would add a shuffle join for 10k rows)
      val base = fp.groupBy(col("doc_id").as("media_id"))
        .agg(
          max(when(col("kind") === 0, col("fp_hi"))).as("fp_hi_o"),
          max(when(col("kind") === 0, col("fp_lo"))).as("fp_lo_o"),
          max(when(col("kind") === 1, col("fp_hi"))).as("fp_hi_r"),
          max(when(col("kind") === 1, col("fp_lo"))).as("fp_lo_r"))
        .withColumn("hamming",
          (bit_count(col("fp_lo_o").bitwiseXOR(col("fp_lo_r"))) +
            bit_count(col("fp_hi_o").bitwiseXOR(col("fp_hi_r"))))
            .cast("int"))
      val caught = hp
        .filter(col("mb") === col("ma") + 1 && col("ma") % 2 === 0)
        .select(expr("ma div 2").as("media_id"), lit(1).as("cf"))
      // exact patch digests, also inline from the string: one codegen'd
      // projection over 4 patch rows per (doc, kind) — no pixel
      // collection/sort anywhere
      val pat = docsW
        .select(col("doc_id"), col("kind"),
          explode(sequence(lit(0), lit(3))).as("pi"), col("pv"))
        .select(col("doc_id"), col("kind"),
          md5(expr("array_join(transform(slice(pv, pi * 64 + 1, 64)," +
            " x -> CAST(x AS STRING)), '-')")).as("ph"))
      // shared digests in ONE shuffle: a digest is shared iff both kinds
      // produced it (distinct-per-kind via bool_or, no self-join)
      val shp = pat.groupBy("doc_id", "ph")
        .agg(max(when(col("kind") === 0, 1).otherwise(0)).as("h0"),
          max(when(col("kind") === 1, 1).otherwise(0)).as("h1"))
        .filter(col("h0") === 1 && col("h1") === 1)
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("bigint").as("shared_patches"))
      val tot = hp.agg(count(lit(1)).cast("bigint").as("n_pairs_total"))
      base
        .join(broadcast(caught), Seq("media_id"), "left")
        .join(broadcast(shp.withColumnRenamed("doc_id", "media_id")),
          Seq("media_id"), "left")
        .crossJoin(broadcast(tot))
        .select(col("media_id"), col("fp_hi_o"), col("fp_lo_o"),
          col("fp_hi_r"), col("fp_lo_r"), col("hamming"),
          coalesce(col("cf"), lit(0)).cast("int").as("caught"),
          coalesce(col("shared_patches"), lit(0L)).as("shared_patches"),
          col("n_pairs_total"))
        .orderBy("media_id")
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
