package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column handling (SURVEY.md §2.B D21).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside — the schema/partitioning/batching plumbing is real
  * and tested; the actual image/audio decode is STUBBED (no codec
  * libraries in this environment) behind [[decodeImageStub]], which
  * produces a deterministic fake so tests are reproducible.
  *
  * Scale design: payload bytes stay columnar in parquet and are never
  * shuffled — metadata extraction is a narrow map; feature extraction
  * via [[extractFeatures]] runs `mapPartitions` so a real decoder would
  * amortize per-batch setup (model load, codec init) across a partition,
  * the same shape a Pandas-UDF/`mapInPandas` pipeline has in PySpark.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  case class MediaMeta(docId: Long, modality: String, nBytes: Int, contentMd5: String)

  /** Decoded-media features. Deterministic STUB: a real deployment
    * would decode `payload` (JPEG/PNG/WAV...) here; this environment has
    * no codec libs, so dimensions derive from the content hash. */
  case class DecodedMedia(docId: Long, width: Int, height: Int, nChannels: Int)

  /** SPI: the pluggable per-partition media decoder (round-10 verdict
    * missing #4). A real deployment implements this over its codec
    * stack and installs it via [[decoderFactory]]; the Spark-side
    * plumbing — schema, partitioning, once-per-partition lifecycle —
    * is identical for the stub and a real codec, so swapping decoders
    * never touches a plan. `open()` runs once per partition BEFORE the
    * first decode (codec tables, model weights), `close()` after the
    * partition drains. Implementations must be Serializable: the
    * FACTORY ships to executors and constructs the decoder there, so
    * non-serializable codec handles belong in `open()`, not fields. */
  trait BlobDecoder extends Serializable {
    def open(): Unit = ()
    def decode(docId: Long, payload: Array[Byte]): DecodedMedia
    def close(): Unit = ()
  }

  /** The deterministic stub decoder (no codec libraries in this
    * environment): fake dimensions derive from the content hash so
    * tests and oracles are reproducible. */
  object StubImageDecoder extends BlobDecoder {
    override def decode(docId: Long, payload: Array[Byte]): DecodedMedia =
      decodeImageStub(docId, payload)
  }

  /** Decoder the m3/m6 feature-extraction queries instantiate per
    * partition — the stub by default; a deployment swaps in its codec
    * implementation here (read once at plan time, so concurrent
    * queries each capture a consistent factory). */
  @volatile var decoderFactory: () => BlobDecoder = () => StubImageDecoder

  /** STUB decode — replace with a real codec at deployment (via
    * [[decoderFactory]]). Keeps the signature a real decoder would
    * have (bytes in, features out). */
  def decodeImageStub(docId: Long, payload: Array[Byte]): DecodedMedia = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
    // deterministic fake dimensions from the first hash bytes
    val w = 64 + (java.lang.Byte.toUnsignedInt(md5(0)) % 192)
    val h = 64 + (java.lang.Byte.toUnsignedInt(md5(1)) % 192)
    DecodedMedia(docId, w, h, 3)
  }

  /** Shared decode stage: one [[BlobDecoder]] per PARTITION (open →
    * decode each row → close when the TASK completes), never one per
    * row — the shape that amortizes codec/model init at scale.
    * close() is bound to the task-completion listener, NOT to iterator
    * exhaustion: a downstream limit/take or a decode() exception leaves
    * the iterator undrained, and a real codec's native handles must be
    * released on that path too (completion listeners run on success,
    * failure, and early termination alike). */
  private[graft] def decodePartitions(
      ds: Dataset[(Long, Array[Byte])]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    val factory = decoderFactory // capture at plan time
    ds.mapPartitions { it =>
      val d = factory()
      d.open()
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => d.close())
      val mapped = it.map { case (id, bytes) => d.decode(id, bytes) }
      // no task context (driver-local testing shape): fall back to
      // close-on-drain so the lifecycle still completes
      if (tc != null) mapped
      else mapped ++ { d.close(); Iterator.empty }
    }
  }

  /** Documents with text re-encoded as an opaque binary payload +
    * assigned modality — the fixture's stand-in for real media blobs. */
  def withPayload(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")))
  }

  /** D21: metadata extraction over binary payloads — byte length, md5,
    * modality, all as narrow column expressions. */
  def m1BlobMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir)
      .select(
        $"doc_id", $"modality",
        octet_length($"payload").as("n_bytes"),
        md5($"payload").as("content_md5"))
      .orderBy($"doc_id")
  }

  /** D21: frame-sampling plumbing — treat the payload as fixed-size
    * 256-byte "frames", sample every 4th frame offset (the batch shape
    * a video pipeline has; the decode itself is the stub). */
  def m2FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir)
      .filter($"modality" === "video")
      .withColumn("n_frames", floor(octet_length($"payload") / 256).cast("int"))
      .filter($"n_frames" > 0)
      .withColumn("sampled_offsets",
        sequence(lit(0), ($"n_frames" - 1) * 256, lit(1024)))
      .select($"doc_id", $"n_frames", size($"sampled_offsets").as("n_sampled"),
        element_at($"sampled_offsets", -1).as("last_offset"))
      .orderBy($"doc_id")
  }

  /** D21 feature extraction through the stub decoder — mapPartitions so
    * a real decoder initializes once per partition, not per row.
    * Aggregated output keeps the query oracle-checkable. */
  def m3DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val decoded: Dataset[DecodedMedia] = decodePartitions(
      withPayload(spark, dir)
        .select($"doc_id", $"payload")
        .as[(Long, Array[Byte])])
    decoded.toDF()
      .groupBy($"nChannels".as("n_channels"))
      .agg(
        count(lit(1)).as("n_media"),
        round(avg($"width"), 4).as("avg_width"),
        round(avg($"height"), 4).as("avg_height"),
        max($"width").as("max_width"))
      .orderBy($"n_channels")
  }

  /** m7 PCM frame width in bytes (a real pipeline: samples/frame). */
  val vadFrameBytes = 64L
  /** m7 voiced threshold on the per-mille energy scale. */
  val vadThreshold = 500

  /** D125: audio voice-activity plumbing — per audio blob, fixed-width
    * frame energies, voiced-frame census, and the LONGEST VOICED RUN
    * (the segment a VAD would hand to ASR). The decode is the m3-style
    * STUB: per-frame "energy" derives from the content hash (no audio
    * codecs in this environment); everything around it — frame
    * explode, per-frame scoring, gaps-and-islands run detection — is
    * the real distributed shape a PCM pipeline has.
    *
    * Runs are found with the classic islands trick: among voiced
    * frames, `frame − row_number()` is constant within a consecutive
    * run, so one window pass + one aggregate finds the longest — no
    * self-join, no sequential scan. Both windows are PARTITIONED BY
    * doc_id (high-cardinality — parallelizes with the corpus, the c2
    * discipline); frame fan-out is bounded by payload size / 64. */
  def m7AudioVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val frames = withPayload(spark, dir)
      .filter($"modality" === "audio")
      .select($"doc_id", md5($"payload").as("content_md5"),
        floor(octet_length($"payload") / vadFrameBytes).cast("int").as("n_frames"))
      .filter($"n_frames" > 0)
      .select($"doc_id", $"content_md5", $"n_frames",
        explode(sequence(lit(1), $"n_frames")).as("f"))
      .withColumn("e",
        conv(substring(md5(concat($"content_md5", lit(":"), $"f".cast("string"))),
          1, 3), 16, 10).cast("int") % 1000)
    val base = frames.groupBy($"doc_id")
      .agg(max($"n_frames").as("n_frames"),
        sum(when($"e" >= vadThreshold, 1L).otherwise(0L)).as("n_voiced"),
        // exact integer Σe then ONE division — no double summation order
        round(sum($"e").cast("double") /
          (count(lit(1)).cast("double") * 1000.0), 4).as("mean_energy"))
    val wIdx = Window.partitionBy($"doc_id").orderBy($"f")
    val runs = frames.filter($"e" >= vadThreshold)
      .withColumn("grp", $"f" - row_number().over(wIdx))
      .groupBy($"doc_id", $"grp").agg(count(lit(1)).as("run"))
      .groupBy($"doc_id").agg(max($"run").as("longest_voiced"))
    base.join(runs, Seq("doc_id"), "left")
      .select($"doc_id", $"n_frames", $"n_voiced", $"mean_energy",
        coalesce($"longest_voiced", lit(0L)).as("longest_voiced"))
      .orderBy($"doc_id")
  }

  /** Byte budget per media shard (m4). Fixture payloads are ~300-byte
    * text blobs, so ~12–14 pack per shard — the overflow boundary is
    * exercised; production would use the object-store part size. */
  val shardBudget = 4096L

  /** D56: modality-aware shard packing — bin media blobs into
    * byte-budgeted shards per modality and emit the shard manifest
    * (modality, shard_id, n_blobs, total_bytes). This is the c3
    * sequence-packing fold ([[Pipeline.packFold]]) applied to BYTES
    * instead of tokens: same `groupByKey(modality).flatMapSortedGroups`
    * secondary-sort shape (streaming fold, O(1) state, no group
    * buffering), same recursive-CTE oracle. Payload bytes never
    * shuffle — only (bucket, doc_id, n_bytes) triples; a production
    * writer would fetch blobs shard-locally at write time. */
  def m4ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = withPayload(spark, dir)
      .select(pmod($"doc_id", lit(3)).cast("long").as("bucket"), $"doc_id",
        octet_length($"payload").cast("long").as("toks"))
      .as[PackDoc]
    blobs.groupByKey(_.bucket)
      .flatMapSortedGroups($"doc_id") { (_: Long, it: Iterator[PackDoc]) =>
        Pipeline.packFold(it, shardBudget)
      }
      .toDF()
      .groupBy($"bucket", $"seq_id".as("shard_id"))
      .agg(count(lit(1)).as("n_blobs"), sum($"toks").as("total_bytes"))
      .select(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          ($"bucket" + 1).cast("int")).as("modality"),
        $"shard_id", $"n_blobs", $"total_bytes")
      .orderBy($"modality", $"shard_id")
  }

  /** Patch granularity for m5: one patch token per 64 payload bytes. */
  val patchBytes = 64.0

  /** Joint token budget per interleaved training sequence (m5). */
  val interleavedBudget = 512L

  /** D73: interleaved multimodal sequence packing — the
    * multimodal-pretraining sample shape: each document contributes its
    * TEXT tokens and its media payload's PATCH tokens
    * (ceil(bytes / 64)), and samples pack greedily against ONE joint
    * budget. Same `flatMapSortedGroups` streaming fold as c3/m4
    * (O(1) state, payloads never shuffle — only (bucket, doc_id, cost)
    * triples); output is the per-sequence manifest. The joint cost is
    * what distinguishes this from c3 (text-only) and m4 (bytes-only,
    * modality-segregated): one budget governs the interleaved stream,
    * exactly how a vision-language training loader packs. */
  def m5InterleavedPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val samples = withPayload(spark, dir)
      .select(pmod($"doc_id", lit(Pipeline.packBuckets)).as("bucket"),
        $"doc_id",
        (size(TextAnalysis.tokens($"text")).cast("long") +
          ceil(octet_length($"payload") / patchBytes).cast("long")).as("toks"))
      .as[PackDoc]
    samples.groupByKey(_.bucket)
      .flatMapSortedGroups($"doc_id") { (_: Long, it: Iterator[PackDoc]) =>
        Pipeline.packFold(it, interleavedBudget)
      }
      .toDF()
      .groupBy($"bucket", $"seq_id")
      .agg(count(lit(1)).as("n_samples"), sum($"toks").cast("long").as("total_toks"))
      .orderBy($"bucket", $"seq_id")
  }

  /** Aspect-ratio boundaries for [[m6AspectBuckets]] in integer
    * per-mille: portrait < 900, square 900–1111, landscape > 1111. */
  val arPortraitMax = 900L
  val arSquareMax = 1111L

  /** D110: aspect-ratio bucket census + padding-waste planner — the
    * image-batching question "if I batch by aspect class and pad each
    * batch to its class max, how many pixels do I waste". Decoded
    * (stub) dimensions classify into portrait/square/landscape by the
    * INTEGER per-mille ratio (w·1000 div h — no float compare), and
    * each class reports its max dims and the padding-waste fraction
    * 1 − Σ(w·h)/(n·maxW·maxH).
    *
    * Scale shape: decode runs mapPartitions (m3's once-per-partition
    * init shape), the census is a partial-aggregated 3-row groupBy;
    * the only float is the final 4-dp waste division. */
  def m6AspectBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val decoded: Dataset[DecodedMedia] = decodePartitions(
      withPayload(spark, dir)
        .filter($"modality" === "image")
        .select($"doc_id", $"payload")
        .as[(Long, Array[Byte])])
    decoded.toDF()
      .withColumn("armil", expr("(width * 1000) div height"))
      .withColumn("bucket",
        when($"armil" < arPortraitMax, "portrait")
          .when($"armil" <= arSquareMax, "square")
          .otherwise("landscape"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_media"),
        max($"width").as("max_w"), max($"height").as("max_h"),
        sum(($"width" * $"height").cast("long")).as("px"))
      .select($"bucket", $"n_media", $"max_w", $"max_h",
        round(lit(1.0) - $"px".cast("double") /
          ($"n_media" * $"max_w".cast("long") * $"max_h").cast("double"), 4)
          .as("pad_waste"))
      .orderBy($"bucket")
  }

  // ---------------------------------------------------------------- m8

  /** m8 band-bucket skew cap — the d4/d9 LSH discipline: a band value
    * shared by more than this many images is dropped from candidate
    * generation (deterministic, replayed by the oracle). */
  val phashBandCap = 64
  /** m8 near-duplicate threshold in bits. With 4 bands, hamming ≤ 3
    * pigeonholes at least one band to be IDENTICAL, so banding loses
    * nothing below the threshold. */
  val phashMaxHamming = 3

  /** STUB 60-bit perceptual hash over an image payload, as a column
    * pipeline (the [[decodeImageStub]] convention: no codec libs in
    * this environment). The fake reproduces the DISTRIBUTION a real
    * DCT pHash has: the high-order structure derives from coarse
    * content features (lang, source, length bucket — the stand-ins for
    * subject/palette/layout), and a per-image NOISE term flips
    * `doc_id % 5` md5-chosen bits — so images of the same "subject"
    * land within a few bits of each other, exactly what hamming-banded
    * near-dup search exploits. Deterministic on both engines (md5 hex
    * arithmetic, no RNG). */
  private def phashed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = (0 to 3).map { i =>
      (conv(substring(md5(concat_ws(":",
        $"lang", $"source", expr("n_chars div 50"), lit(i))), 1, 4), 16, 10)
        .cast("long") % 32768).as(s"b$i")
    }
    val ps = (1 to 4).map { j =>
      (conv(substring(md5($"doc_id".cast("string")), 2 * j - 1, 2), 16, 10)
        .cast("long") % 60).as(s"p$j")
    }
    withPayload(spark, dir).filter($"modality" === "image")
      .select(Seq($"doc_id", $"lang", $"source", $"n_chars") ++ bands ++ ps: _*)
      .withColumn("noise", expr((1 to 4).map(j =>
        s"""CASE WHEN $j <= doc_id % 5
              THEN shiftleft(CAST(1 AS BIGINT), CAST(p$j AS INT))
              ELSE CAST(0 AS BIGINT) END""").mkString("(", ") ^ (", ")")))
      .select($"doc_id",
        expr("(b0 + b1 * 32768 + b2 * 1073741824 + b3 * 35184372088832) ^ noise")
          .as("phash"))
  }

  /** D139: perceptual-hash near-duplicate image pairs — hamming
    * distance ≤ [[phashMaxHamming]] over 60-bit pHashes, the standard
    * image-dedup pass of a multimodal training pipeline.
    *
    * Scale shape: multi-index hamming search. The hash splits into 4
    * disjoint 15-bit bands; hamming ≤ 3 guarantees (pigeonhole) an
    * EXACT match on at least one band, so candidates come from 4
    * band-value self-equi-joins (×4 fan-out, id+hash pairs on the
    * wire, payloads never move) and the verify is one xor+bit_count —
    * never an all-pairs scan. Band buckets above [[phashBandCap]] are
    * dropped (the d4 skew cap, deterministic and oracle-replayed);
    * pairs matching in several bands collapse via distinct. */
  def phashPairs(imgs: DataFrame): DataFrame = {
    import imgs.sparkSession.implicits._
    val sig = imgs.select($"doc_id", $"phash",
      posexplode(array((0 to 3).map(i =>
        expr(s"shiftright(phash, ${15 * i}) & 32767")): _*))
        .as(Seq("bi", "bv")))
    val ok = sig.groupBy($"bi", $"bv").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" <= phashBandCap).select($"bi", $"bv")
    val s2 = sig.join(ok, Seq("bi", "bv"))
    s2.as("a").join(s2.as("b"),
        $"a.bi" === $"b.bi" && $"a.bv" === $"b.bv" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        expr("CAST(bit_count(a.phash ^ b.phash) AS INT)").as("hamming"))
      .filter($"hamming" <= phashMaxHamming)
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  def m8PhashNeardup(spark: SparkSession, dir: String): DataFrame =
    phashPairs(phashed(spark, dir))

  // ---------------------------------------------------------------- m9

  /** m9 frame width in bytes (the m2 video-frame convention). */
  val sceneFrameBytes = 256L
  /** m9 cut threshold on the per-mille energy delta scale. */
  val sceneCutDelta = 500

  /** D148: video scene segmentation plumbing — per video blob,
    * fixed-width frame "energies" (the m7 STUB decode: md5-derived,
    * no codecs in this environment), a SCENE CUT wherever the
    * energy jumps by more than [[sceneCutDelta]] against the previous
    * frame, and the per-video scene census (count, longest scene,
    * mean length): the shot-boundary pass a video training pipeline runs
    * before frame sampling (m2) can be scene-aware.
    *
    * Scale shape: frame explode bounded by payload size / 256; the
    * delta is ONE lag window and scene ids ONE running sum, both
    * PARTITIONED BY doc_id (high cardinality — the m7 discipline);
    * scene lengths are a per-(doc, scene) partial aggregate. Mean
    * length is the exact integer pair n_frames/n_scenes divided once,
    * 4-dp. */
  /** Per-frame scene assignment shared by m9 and m10: md5-derived
    * frame energies (the m7 STUB decode), lag-delta cuts, running
    * scene ids — all PARTITIONED BY doc_id (high cardinality). */
  private def sceneFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val frames = withPayload(spark, dir)
      .filter($"modality" === "video")
      .select($"doc_id", md5($"payload").as("cm"),
        floor(octet_length($"payload") / sceneFrameBytes).cast("int")
          .as("n_frames"))
      .filter($"n_frames" > 0)
      .select($"doc_id", $"cm", $"n_frames",
        explode(sequence(lit(1), $"n_frames")).as("f"))
      .withColumn("e",
        conv(substring(md5(concat($"cm", lit(":"), $"f".cast("string"))),
          1, 3), 16, 10).cast("int") % 1000)
    val wSeq = Window.partitionBy($"doc_id").orderBy($"f")
    frames
      .withColumn("pe", lag($"e", 1).over(wSeq))
      .withColumn("cut",
        when($"pe".isNotNull && abs($"e" - $"pe") > sceneCutDelta, 1L)
          .otherwise(0L))
      .withColumn("scene", sum($"cut").over(wSeq))
  }

  /** D176: scene KEYFRAME selection — per (video, scene), the
    * argmax-energy frame (ties → earliest), i.e. the representative
    * frame a vision-training pipeline samples per shot once m9 has
    * drawn the shot boundaries (scene-aware sampling beats the m2
    * uniform stride precisely because it picks one salient frame per
    * scene instead of k per fixed bytes).
    *
    * Scale shape: reuses [[sceneFrames]] (explode bounded by payload
    * bytes / frame width); the argmax is ONE row_number window over
    * the high-cardinality (doc, scene) key; output rows = scene count,
    * not frame count. */
  def m10Keyframes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wScene = Window.partitionBy($"doc_id", $"scene")
    sceneFrames(spark, dir)
      .withColumn("scene_len", count(lit(1)).over(wScene))
      .withColumn("rk", row_number().over(
        wScene.orderBy($"e".desc, $"f")))
      .filter($"rk" === 1)
      .select($"doc_id", $"scene", $"scene_len",
        $"f".as("kf_frame"), $"e".as("kf_energy"))
      .orderBy($"doc_id", $"scene")
  }

  def m9SceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scenes = sceneFrames(spark, dir)
      .groupBy($"doc_id", $"scene")
      .agg(max($"n_frames").as("n_frames"), count(lit(1)).as("len"))
    scenes.groupBy($"doc_id")
      .agg(max($"n_frames").as("n_frames"),
        count(lit(1)).as("n_scenes"),
        max($"len").as("longest_scene"))
      .select($"doc_id", $"n_frames", $"n_scenes", $"longest_scene",
        round(expr("CAST(n_frames AS DOUBLE) / CAST(n_scenes AS DOUBLE)"), 4)
          .as("mean_scene_len"))
      .orderBy($"doc_id")
  }

  /** D181: within-video duplicate-frame census — per video, how many
    * frames are energy-identical to another (the static-shot /
    * freeze-frame fraction) and the longest run of consecutive
    * identical frames: the compression-potential readout a video
    * pipeline checks before paying per-frame decode+embed cost on
    * frozen content (a 0.9 dup_frac video wants m10's one-keyframe-
    * per-scene sampling, not the m2 uniform stride).
    *
    * Shape: reuses the shared [[sceneFrames]] explode (payload-
    * bounded); distinct census is one per-(doc, e) aggregate; the
    * longest run is the islands lag trick (q40/q88 precedent) —
    * boundaries where e ≠ previous, run ids one running sum, all
    * PARTITIONED BY doc_id. */
  def m11FrameDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy($"doc_id").orderBy($"f")
    val runs = sceneFrames(spark, dir)
      .withColumn("brk",
        when($"pe".isNull || $"e" =!= $"pe", 1L).otherwise(0L))
      .withColumn("run", sum($"brk").over(wSeq))
    val longest = runs.groupBy($"doc_id", $"run")
      .agg(count(lit(1)).as("len"))
      .groupBy($"doc_id").agg(max($"len").as("max_run"))
    runs.groupBy($"doc_id", $"e")
      .agg(max($"n_frames").as("n_frames"), count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(max($"n_frames").as("n_frames"),
        count(lit(1)).as("n_distinct"),
        sum($"cnt" - lit(1L)).as("n_dup_frames"))
      .join(longest, "doc_id")
      .select($"doc_id", $"n_frames", $"n_distinct", $"n_dup_frames",
        round($"n_dup_frames".cast("double") / $"n_frames".cast("double"), 4)
          .as("dup_frac"),
        $"max_run")
      .orderBy($"doc_id")
  }

  /** D195: multimodal token-budget accounting — per (modality, lang),
    * the TEXT-token and PATCH-token supply (m5's ceil(bytes/64) patch
    * formula) and each cell's share of the joint training budget: the
    * table a multimodal mixture designer reads before setting c6-style
    * sampling weights, because media patches — not text — dominate the
    * context-window cost and a byte census (m1) hides that by a 64×
    * factor.
    *
    * Exactness: every count is an exact integer; shares are one 4-dp
    * division against the broadcast ONE-row grand total (g8/q43
    * audited cross shape).
    *
    * Scale shape: ONE map-side-combined pass over the corpus to a
    * ≤ |modalities|·|langs| census; payloads never shuffle (narrow
    * column expressions only). */
  def m12TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = withPayload(spark, dir)
      .select($"modality", $"lang",
        size(TextAnalysis.tokens($"text")).cast("long").as("tt"),
        ceil(octet_length($"payload") / patchBytes).cast("long").as("pt"))
      .groupBy($"modality", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"tt").as("text_toks"),
        sum($"pt").as("patch_toks"))
      .withColumn("total_toks", $"text_toks" + $"patch_toks")
    val tot = per.agg(sum($"total_toks").as("g"))
    per.crossJoin(broadcast(tot))
      .select($"modality", $"lang", $"n_docs", $"text_toks", $"patch_toks",
        $"total_toks",
        round($"total_toks".cast("double") / $"g".cast("double"), 4)
          .as("share"))
      .orderBy($"modality", $"lang")
  }

  /** D208: corrupt-blob audit — per modality, how many payloads fail
    * their integrity check (STUB: md5 first hex digit = '0', a
    * deterministic 1/16 "checksum mismatch" — real pipelines check a
    * stored digest against a recomputed one, which is exactly the
    * md5-compare plumbing exercised here), with the byte supply lost:
    * the ingest-health readout a media pipeline checks before blaming
    * the decoder for bad samples (m1's census says what arrived; THIS
    * says what arrived BROKEN).
    *
    * Exactness: all counts/bytes exact integers; one 4-dp fraction.
    * Scale shape: ONE narrow-expression scan, map-side-combined to
    * ≤ |modalities| rows; payloads never shuffle. */
  def m13CorruptAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(spark, dir)
      .select($"modality",
        (substring(md5($"payload"), 1, 1) === "0").cast("long").as("bad"),
        octet_length($"payload").cast("long").as("nb"))
      .groupBy($"modality")
      .agg(count(lit(1)).as("n_blobs"),
        sum($"bad").as("n_corrupt"),
        sum($"bad" * $"nb").as("bytes_lost"),
        sum($"nb").as("bytes_total"))
      .withColumn("corrupt_frac",
        round($"n_corrupt".cast("double") / $"n_blobs".cast("double"), 4))
      .orderBy($"modality")
  }

  /** Smallest side kept in the m14 resize pyramid; levels halve until
    * either side would fall below it. */
  val pyrMinSide = 32
  /** Upper bound on explored pyramid levels (dims are bounded, so the
    * explode fan-out is a small constant, never data-dependent). */
  val pyrMaxLevels = 8

  /** D272: resize-pyramid storage planner — per image, the mipmap
    * levels a multi-resolution training pipeline would materialize
    * (halve until a side < [[pyrMinSide]]), rolled up per pyramid
    * DEPTH: image count, source pixels, total pyramid pixels, and the
    * storage overhead ratio. This is the budget table read before
    * materializing thumbnails/pyramids for vision training — the m6
    * padding-waste planner's sibling for the resize axis.
    *
    * Exactness: dims come from the stub decoder (hash-derived — the
    * m1/m6 convention; the REAL decoder drops in behind the
    * [[BlobDecoder]] SPI); level dims are integer shifts, so every
    * pixel sum is an exact integer and the single ratio divides two
    * exact sums, 4-dp.
    *
    * Scale shape: the decode rides the once-per-partition SPI stage;
    * the level explode is a ≤ [[pyrMaxLevels]] constant fan-out; two
    * partial-aggregated rollups (per image, then per depth — ≤ depth
    * rows). */
  def m14PyramidPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val decoded: Dataset[DecodedMedia] = decodePartitions(
      withPayload(spark, dir)
        .filter($"modality" === "image")
        .select($"doc_id", $"payload")
        .as[(Long, Array[Byte])])
    val lv = decoded.toDF()
      .select($"docId".as("doc_id"), $"width".as("w"), $"height".as("h"),
        explode(typedLit((0 until pyrMaxLevels).toArray)).as("l"))
      .filter(expr(s"shiftright(w, l) >= $pyrMinSide AND " +
        s"shiftright(h, l) >= $pyrMinSide"))
    val per = lv.groupBy($"doc_id")
      .agg(count(lit(1)).as("depth"),
        (max($"w") * max($"h")).cast("long").as("spx"),
        sum(expr("CAST(shiftright(w, l) * shiftright(h, l) AS BIGINT)"))
          .as("ppx"))
    per.groupBy($"depth")
      .agg(count(lit(1)).as("n_images"),
        sum($"spx").as("src_px"), sum($"ppx").as("pyr_px"))
      .select($"depth", $"n_images", $"src_px", $"pyr_px",
        round($"pyr_px".cast("double") / $"src_px".cast("double"), 4)
          .as("overhead"))
      .orderBy($"depth")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m14_pyramid_plan" -> m14PyramidPlan,
    "m13_corrupt_audit" -> m13CorruptAudit,
    "m12_token_budget" -> m12TokenBudget,
    "m11_frame_dedup" -> m11FrameDedup,
    "m10_keyframes" -> m10Keyframes,
    "m9_scene_cuts" -> m9SceneCuts,
    "m8_phash_neardup" -> m8PhashNeardup,
    "m6_aspect_buckets" -> m6AspectBuckets,
    "m5_interleaved_pack" -> m5InterleavedPack,
    "m4_shard_manifest" -> m4ShardManifest,
    "m1_blob_meta" -> m1BlobMeta,
    "m2_frame_sample" -> m2FrameSample,
    "m3_decode_features" -> m3DecodeFeatures,
    "m7_audio_vad" -> m7AudioVad)

  val oracle: Map[String, String] = Map(
    "m13_corrupt_audit" ->
      """WITH b AS (SELECT
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS modality,
              CASE WHEN substr(md5(text), 1, 1) = '0' THEN 1 ELSE 0 END
                AS bad,
              CAST(strlen(text) AS BIGINT) AS nb
            FROM documents)
          SELECT modality, CAST(count(*) AS BIGINT) AS n_blobs,
            CAST(sum(bad) AS BIGINT) AS n_corrupt,
            CAST(sum(bad * nb) AS BIGINT) AS bytes_lost,
            CAST(sum(nb) AS BIGINT) AS bytes_total,
            round(CAST(sum(bad) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
              AS corrupt_frac
          FROM b GROUP BY modality ORDER BY modality""",
    "m12_token_budget" ->
      s"""WITH b AS (SELECT
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS modality,
              lang,
              CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tt,
              CAST(ceil(strlen(text) / $patchBytes) AS BIGINT) AS pt
            FROM documents),
          per AS (SELECT modality, lang,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(tt) AS BIGINT) AS text_toks,
              CAST(sum(pt) AS BIGINT) AS patch_toks,
              CAST(sum(tt) + sum(pt) AS BIGINT) AS total_toks
            FROM b GROUP BY 1, 2),
          tot AS (SELECT CAST(sum(total_toks) AS BIGINT) AS g FROM per)
          SELECT modality, lang, n_docs, text_toks, patch_toks, total_toks,
            round(CAST(total_toks AS DOUBLE) / CAST(g AS DOUBLE), 4) AS share
          FROM per CROSS JOIN tot ORDER BY modality, lang""",
    "m11_frame_dedup" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS cm,
              CAST(strlen(text) // $sceneFrameBytes AS INT) AS n_frames
            FROM documents
            WHERE doc_id % 3 = 2 AND strlen(text) >= $sceneFrameBytes),
          fr AS (SELECT doc_id, cm, n_frames,
              unnest(generate_series(1, n_frames)) AS f
            FROM d),
          e AS (SELECT doc_id, n_frames, f,
              CAST('0x' || substring(md5(cm || ':' || CAST(f AS VARCHAR)),
                1, 3) AS INT) % 1000 AS e
            FROM fr),
          c AS (SELECT doc_id, n_frames, f, e,
              lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe
            FROM e),
          rn AS (SELECT doc_id, n_frames, e,
              CAST(sum(CASE WHEN pe IS NULL OR e <> pe THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY f
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS run
            FROM c),
          lg AS (SELECT doc_id, CAST(max(len) AS BIGINT) AS max_run
            FROM (SELECT doc_id, run, count(*) AS len
                  FROM rn GROUP BY 1, 2) GROUP BY 1),
          de AS (SELECT doc_id, e, CAST(max(n_frames) AS INT) AS n_frames,
              CAST(count(*) AS BIGINT) AS cnt
            FROM rn GROUP BY 1, 2),
          agg AS (SELECT doc_id, CAST(max(n_frames) AS INT) AS n_frames,
              CAST(count(*) AS BIGINT) AS n_distinct,
              CAST(sum(cnt - 1) AS BIGINT) AS n_dup_frames
            FROM de GROUP BY 1)
          SELECT a.doc_id, a.n_frames, a.n_distinct, a.n_dup_frames,
            round(CAST(a.n_dup_frames AS DOUBLE)
              / CAST(a.n_frames AS DOUBLE), 4) AS dup_frac,
            l.max_run
          FROM agg a JOIN lg l USING (doc_id) ORDER BY a.doc_id""",
    "m10_keyframes" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS cm,
              CAST(strlen(text) // $sceneFrameBytes AS INT) AS n_frames
            FROM documents
            WHERE doc_id % 3 = 2 AND strlen(text) >= $sceneFrameBytes),
          fr AS (SELECT doc_id, cm, n_frames,
              unnest(generate_series(1, n_frames)) AS f
            FROM d),
          e AS (SELECT doc_id, f,
              CAST('0x' || substring(md5(cm || ':' || CAST(f AS VARCHAR)),
                1, 3) AS INT) % 1000 AS e
            FROM fr),
          c AS (SELECT doc_id, f, e,
              lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe
            FROM e),
          sc AS (SELECT doc_id, f, e,
              CAST(sum(CASE WHEN pe IS NOT NULL
                  AND abs(e - pe) > $sceneCutDelta THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY f
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS scene
            FROM c),
          k AS (SELECT doc_id, scene, e, f,
              CAST(count(*) OVER (PARTITION BY doc_id, scene)
                AS BIGINT) AS scene_len,
              row_number() OVER (PARTITION BY doc_id, scene
                ORDER BY e DESC, f) AS rk
            FROM sc)
          SELECT doc_id, scene, scene_len, CAST(f AS INT) AS kf_frame,
            e AS kf_energy
          FROM k WHERE rk = 1 ORDER BY doc_id, scene""",
    "m9_scene_cuts" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS cm,
              CAST(strlen(text) // $sceneFrameBytes AS INT) AS n_frames
            FROM documents
            WHERE doc_id % 3 = 2 AND strlen(text) >= $sceneFrameBytes),
          fr AS (SELECT doc_id, cm, n_frames,
              unnest(generate_series(1, n_frames)) AS f
            FROM d),
          e AS (SELECT doc_id, n_frames, f,
              CAST('0x' || substring(md5(cm || ':' || CAST(f AS VARCHAR)),
                1, 3) AS INT) % 1000 AS e
            FROM fr),
          c AS (SELECT doc_id, n_frames, f, e,
              lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe
            FROM e),
          sc AS (SELECT doc_id, n_frames, f,
              CAST(sum(CASE WHEN pe IS NOT NULL
                  AND abs(e - pe) > $sceneCutDelta THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY f
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS scene
            FROM c),
          sl AS (SELECT doc_id, scene,
              CAST(max(n_frames) AS INT) AS n_frames,
              CAST(count(*) AS BIGINT) AS len
            FROM sc GROUP BY 1, 2)
          SELECT doc_id, CAST(max(n_frames) AS INT) AS n_frames,
            CAST(count(*) AS BIGINT) AS n_scenes,
            CAST(max(len) AS BIGINT) AS longest_scene,
            round(CAST(max(n_frames) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
              AS mean_scene_len
          FROM sl GROUP BY doc_id ORDER BY doc_id""",
    "m8_phash_neardup" ->
      s"""WITH img AS (SELECT doc_id, lang, source, n_chars
            FROM documents WHERE doc_id % 3 = 0),
          bb AS (SELECT doc_id,
              CAST('0x' || substring(md5(lang || ':' || source || ':'
                || CAST(n_chars // 50 AS VARCHAR) || ':0'), 1, 4) AS BIGINT) % 32768 AS b0,
              CAST('0x' || substring(md5(lang || ':' || source || ':'
                || CAST(n_chars // 50 AS VARCHAR) || ':1'), 1, 4) AS BIGINT) % 32768 AS b1,
              CAST('0x' || substring(md5(lang || ':' || source || ':'
                || CAST(n_chars // 50 AS VARCHAR) || ':2'), 1, 4) AS BIGINT) % 32768 AS b2,
              CAST('0x' || substring(md5(lang || ':' || source || ':'
                || CAST(n_chars // 50 AS VARCHAR) || ':3'), 1, 4) AS BIGINT) % 32768 AS b3,
              doc_id % 5 AS k,
              CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT) % 60 AS p1,
              CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 3, 2) AS BIGINT) % 60 AS p2,
              CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 5, 2) AS BIGINT) % 60 AS p3,
              CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 7, 2) AS BIGINT) % 60 AS p4
            FROM img),
          ph AS (SELECT doc_id,
              xor(b0 + b1 * 32768 + b2 * 1073741824 + b3 * 35184372088832,
                xor(xor(CASE WHEN 1 <= k THEN (CAST(1 AS BIGINT) << CAST(p1 AS INT))
                        ELSE CAST(0 AS BIGINT) END,
                      CASE WHEN 2 <= k THEN (CAST(1 AS BIGINT) << CAST(p2 AS INT))
                        ELSE CAST(0 AS BIGINT) END),
                    xor(CASE WHEN 3 <= k THEN (CAST(1 AS BIGINT) << CAST(p3 AS INT))
                        ELSE CAST(0 AS BIGINT) END,
                      CASE WHEN 4 <= k THEN (CAST(1 AS BIGINT) << CAST(p4 AS INT))
                        ELSE CAST(0 AS BIGINT) END))) AS phash
            FROM bb),
          sig AS (SELECT doc_id, phash, t.bi AS bi,
              (phash >> (15 * t.bi)) & 32767 AS bv
            FROM ph, (VALUES (0), (1), (2), (3)) t(bi)),
          ok AS (SELECT bi, bv FROM sig GROUP BY 1, 2
            HAVING count(*) <= $phashBandCap),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
            FROM sig a JOIN ok USING (bi, bv)
            JOIN sig b ON b.bi = a.bi AND b.bv = a.bv
              AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, hamming FROM cand
          WHERE hamming <= $phashMaxHamming ORDER BY doc_a, doc_b""",
    "m7_audio_vad" ->
      s"""WITH d AS (SELECT doc_id, md5(text) AS cm,
              CAST(strlen(text) // $vadFrameBytes AS INT) AS n_frames
            FROM documents WHERE doc_id % 3 = 1 AND strlen(text) >= $vadFrameBytes),
          fr AS (SELECT doc_id, cm, n_frames,
              unnest(generate_series(1, n_frames)) AS f
            FROM d),
          e AS (SELECT doc_id, n_frames, f,
              CAST('0x' || substring(md5(cm || ':' || CAST(f AS VARCHAR)), 1, 3)
                AS INT) % 1000 AS e
            FROM fr),
          base AS (SELECT doc_id,
              CAST(max(n_frames) AS INT) AS n_frames,
              CAST(sum(CASE WHEN e >= $vadThreshold THEN 1 ELSE 0 END) AS BIGINT)
                AS n_voiced,
              round(CAST(sum(e) AS DOUBLE) / (count(*) * 1000.0), 4)
                AS mean_energy
            FROM e GROUP BY doc_id),
          v AS (SELECT doc_id, f,
              row_number() OVER (PARTITION BY doc_id ORDER BY f) AS rn
            FROM e WHERE e >= $vadThreshold),
          runs AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS longest_voiced
            FROM (SELECT doc_id, f - rn AS grp, count(*) AS c
                  FROM v GROUP BY doc_id, f - rn)
            GROUP BY doc_id)
          SELECT base.doc_id, base.n_frames, base.n_voiced, base.mean_energy,
            coalesce(runs.longest_voiced, 0) AS longest_voiced
          FROM base LEFT JOIN runs USING (doc_id)
          ORDER BY base.doc_id""",
    "m14_pyramid_plan" ->
      s"""WITH d AS (SELECT doc_id,
              64 + (CAST('0x' || substring(md5(text), 1, 2) AS INT) % 192) AS w,
              64 + (CAST('0x' || substring(md5(text), 3, 2) AS INT) % 192) AS h
            FROM documents WHERE doc_id % 3 = 0),
          lv AS (SELECT doc_id, w, h, l
            FROM d CROSS JOIN (SELECT unnest([${(0 until pyrMaxLevels)
              .mkString(", ")}]) AS l) ll
            WHERE (w >> l) >= $pyrMinSide AND (h >> l) >= $pyrMinSide),
          per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS depth,
              CAST(max(w) * max(h) AS BIGINT) AS spx,
              CAST(sum((w >> l) * (h >> l)) AS BIGINT) AS ppx
            FROM lv GROUP BY doc_id)
          SELECT depth, CAST(count(*) AS BIGINT) AS n_images,
            CAST(sum(spx) AS BIGINT) AS src_px,
            CAST(sum(ppx) AS BIGINT) AS pyr_px,
            round(CAST(sum(ppx) AS DOUBLE) / CAST(sum(spx) AS DOUBLE), 4)
              AS overhead
          FROM per GROUP BY depth ORDER BY depth""",
    "m6_aspect_buckets" ->
      s"""WITH d AS (SELECT doc_id,
              64 + (CAST('0x' || substring(md5(text), 1, 2) AS INT) % 192) AS w,
              64 + (CAST('0x' || substring(md5(text), 3, 2) AS INT) % 192) AS h
            FROM documents WHERE doc_id % 3 = 0),
          b AS (SELECT w, h,
              CASE WHEN (w * 1000) // h < $arPortraitMax THEN 'portrait'
                   WHEN (w * 1000) // h <= $arSquareMax THEN 'square'
                   ELSE 'landscape' END AS bucket
            FROM d)
          SELECT bucket, CAST(count(*) AS BIGINT) AS n_media,
            CAST(max(w) AS INT) AS max_w, CAST(max(h) AS INT) AS max_h,
            round(1.0 - sum(w * h) * 1.0 /
              (count(*) * max(w) * max(h)), 4) AS pad_waste
          FROM b GROUP BY 1 ORDER BY 1""",
    "m5_interleaved_pack" ->
      s"""WITH RECURSIVE d AS (
            SELECT doc_id % ${Pipeline.packBuckets} AS bucket, doc_id,
              CAST(length(string_split(lower(text), ' ')) AS BIGINT)
                + CAST(ceil(strlen(text) / $patchBytes) AS BIGINT) AS toks,
              row_number() OVER (PARTITION BY doc_id % ${Pipeline.packBuckets}
                ORDER BY doc_id) AS rn
            FROM documents),
          r AS (
            SELECT bucket, doc_id, toks, rn,
              CAST(0 AS BIGINT) AS seq_id, toks AS fill
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.bucket, d.doc_id, d.toks, d.rn,
              CASE WHEN r.fill + d.toks > $interleavedBudget
                   THEN r.seq_id + 1 ELSE r.seq_id END,
              CASE WHEN r.fill + d.toks > $interleavedBudget
                   THEN d.toks ELSE r.fill + d.toks END
            FROM r JOIN d ON d.bucket = r.bucket AND d.rn = r.rn + 1)
          SELECT bucket, seq_id, CAST(count(*) AS BIGINT) AS n_samples,
            CAST(sum(toks) AS BIGINT) AS total_toks
          FROM r GROUP BY 1, 2 ORDER BY 1, 2""",
    "m4_shard_manifest" ->
      s"""WITH RECURSIVE d AS (
            SELECT doc_id % 3 AS bucket, doc_id,
              CAST(strlen(text) AS BIGINT) AS nb,
              row_number() OVER (PARTITION BY doc_id % 3 ORDER BY doc_id) AS rn
            FROM documents),
          r AS (
            SELECT bucket, doc_id, nb, rn,
              CAST(0 AS BIGINT) AS shard_id, nb AS fill
            FROM d WHERE rn = 1
            UNION ALL
            SELECT d.bucket, d.doc_id, d.nb, d.rn,
              CASE WHEN r.fill + d.nb > $shardBudget
                   THEN r.shard_id + 1 ELSE r.shard_id END,
              CASE WHEN r.fill + d.nb > $shardBudget
                   THEN d.nb ELSE r.fill + d.nb END
            FROM r JOIN d ON d.bucket = r.bucket AND d.rn = r.rn + 1)
          SELECT CASE bucket WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS modality,
            shard_id, CAST(count(*) AS BIGINT) AS n_blobs,
            CAST(sum(nb) AS BIGINT) AS total_bytes
          FROM r GROUP BY 1, 2 ORDER BY modality, shard_id""",
    "m1_blob_meta" ->
      """SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         CAST(strlen(text) AS INT) AS n_bytes,
         md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",
    "m2_frame_sample" ->
      """WITH f AS (SELECT doc_id, CAST(floor(strlen(text) / 256) AS INT) AS n_frames
           FROM documents WHERE doc_id % 3 = 2)
         SELECT doc_id, n_frames,
           CAST(len(generate_series(0, (n_frames - 1) * 256, 1024)) AS INT) AS n_sampled,
           CAST(list_extract(generate_series(0, (n_frames - 1) * 256, 1024), -1)
             AS INT) AS last_offset
         FROM f WHERE n_frames > 0 ORDER BY doc_id""",
    "m3_decode_features" ->
      """WITH d AS (SELECT doc_id,
            64 + (CAST('0x' || substring(md5(text), 1, 2) AS INT) % 192) AS width,
            64 + (CAST('0x' || substring(md5(text), 3, 2) AS INT) % 192) AS height
          FROM documents)
         SELECT 3 AS n_channels, CAST(count(*) AS BIGINT) AS n_media,
           round(avg(width), 4) AS avg_width,
           round(avg(height), 4) AS avg_height,
           CAST(max(width) AS INT) AS max_width
         FROM d""")
}
