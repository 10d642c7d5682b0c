package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, processed in executor-side batches.
  *
  * The decode kernels themselves are STUBBED (no image/audio libs in this
  * container): [[FakeDecode]] derives deterministic pseudo-metadata and
  * features from the bytes. Everything around the stub is real and tested —
  * the binary schema, the `mapPartitions` iterator-to-iterator batch shape
  * (one decoder instance per partition, the Scala analogue of a Pandas-UDF
  * `mapInPandas` batch), the partitioning, and the downstream columnar
  * feature handling.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, head_byte: Int,
                           fp: String, feature: Array[Float])

  /** The stub decode kernel: replace with a real codec (e.g. JNI/ONNX) by
    * swapping this object; the pipeline shape is unchanged. */
  object FakeDecode {
    def features(bytes: Array[Byte], dims: Int = 8): MediaFeatures = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val fp = md.map("%02x".format(_)).mkString
      val feat = Array.tabulate(dims)(i => ((md(i) & 0xff) / 255.0f))
      MediaFeatures(0L, bytes.length, if (bytes.isEmpty) -1 else bytes(0) & 0xff, fp, feat)
    }
  }

  /** Batched "decode": one kernel instance per partition, iterator in/out —
    * no per-row setup, no driver collect. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder initialization happens here (stubbed)
      it.map { row =>
        FakeDecode.features(row.media).copy(doc_id = row.doc_id)
      }
    }
  }

  /** Documents-as-media adapter: casts text bytes into the binary column so
    * the plumbing runs on the driver testdata. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("media_type")).as[MediaRow]
  }

  case class ResizedMedia(doc_id: Long, out_w: Int, out_h: Int, head: Int,
                          media: Array[Byte], checksum: Long)

  /** Block-average downsample of an opaque raster blob — the image-resize
    * shape: the blob is a row-major `w`-wide byte raster, and each
    * `factor`×`factor` block becomes one output byte (integer floor mean).
    * Input crops to whole blocks (h = n/w full rows, then oh = h/factor
    * block rows) the way a real resize aligns to its kernel; blobs shorter
    * than one block drop out. Same batch contract as [[decodeFeatures]]:
    * one kernel instance per partition, iterator in/out, output blob
    * factor²× smaller than the input, nothing resident more than once. The
    * arithmetic mean is the stub — swap in a real resampler (bilinear /
    * Lanczos via a JNI codec) without touching the pipeline shape. `head`
    * (first output byte) and `checksum` (Σ output bytes, exact int64) let
    * an oracle verify every output pixel arithmetic without shipping the
    * blob. */
  def resizeBlocks(media: Dataset[MediaRow],
                   w: Int = 16, factor: Int = 2): Dataset[ResizedMedia] = {
    require(w >= 1 && factor >= 1 && w % factor == 0,
      s"raster width $w must be a positive multiple of factor $factor")
    import media.sparkSession.implicits._
    val ow = w / factor
    media.mapPartitions { it =>
      it.flatMap { row =>
        val oh = (row.media.length / w) / factor
        if (oh == 0) Iterator.empty
        else {
          val out = new Array[Byte](oh * ow)
          var checksum = 0L
          var r = 0
          while (r < oh) {
            var c = 0
            while (c < ow) {
              var s = 0
              var dr = 0
              while (dr < factor) {
                val base = (r * factor + dr) * w + c * factor
                var dc = 0
                while (dc < factor) { s += row.media(base + dc) & 0xff; dc += 1 }
                dr += 1
              }
              val v = s / (factor * factor)
              out(r * ow + c) = v.toByte
              checksum += v
              c += 1
            }
            r += 1
          }
          Iterator.single(ResizedMedia(row.doc_id, ow, oh, out(0) & 0xff, out, checksum))
        }
      }
    }
  }

  case class SampledFrame(doc_id: Long, frame_idx: Int, fp: String, n_frames: Long)

  /** Frame sampling over an opaque media blob — the video-preprocessing
    * shape: the blob is a sequence of fixed-size frames; every `stride`-th
    * frame is decoded (stubbed to an md5 fingerprint) and emitted with its
    * ORIGINAL frame index, so downstream joins can reference positions in
    * the source media. Same batch contract as [[decodeFeatures]]: one
    * kernel instance per partition, iterator in/out, output rows bounded by
    * frames/stride per doc — a 2-hour video at 30 fps sampled at stride
    * 30 emits 2 rows per second of media regardless of resolution, and no
    * blob is ever resident more than once. */
  def sampleFrames(media: Dataset[MediaRow],
                   frameBytes: Int = 16, stride: Int = 4): Dataset[SampledFrame] = {
    require(frameBytes >= 1 && stride >= 1, s"bad frameBytes=$frameBytes stride=$stride")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init (stubbed; a real codec opens here)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { row =>
        val n = row.media.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, n)
          md.reset()
          md.update(row.media, from, until - from)
          SampledFrame(row.doc_id, i,
            md.digest().map("%02x".format(_)).mkString, nFrames.toLong)
        }
      }
    }
  }

  case class WindowFeature(doc_id: Long, win_idx: Int, energy: Long,
                           fp: String, n_windows: Long)

  /** OVERLAPPING windowed feature extraction — the audio-preprocessing
    * shape (STFT frames with hop < window): full `win`-byte windows every
    * `hop` bytes, each reduced to a per-window feature. The feature kernel
    * is stubbed to an exact int64 byte-sum ("energy") plus an md5
    * fingerprint — swap in a real FFT/filterbank without touching the
    * pipeline shape. Full windows only (a trailing partial window is
    * dropped, the way frame-aligned audio pipelines crop); blobs shorter
    * than one window emit nothing. Same batch contract as the other
    * kernels: one instance per partition, iterator in/out, output rows
    * ∝ n/hop per blob, the blob never resident twice. */
  def windowedFeatures(media: Dataset[MediaRow],
                       win: Int = 32, hop: Int = 16): Dataset[WindowFeature] = {
    require(win >= 1 && hop >= 1, s"bad win=$win hop=$hop")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition kernel init (stubbed; a real FFT plan opens here)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { row =>
        val n = row.media.length
        val nw = if (n < win) 0L else ((n - win) / hop + 1).toLong
        (0L until nw).iterator.map { j =>
          val from = (j * hop).toInt
          var e = 0L
          var i = from
          while (i < from + win) { e += row.media(i) & 0xff; i += 1 }
          md.reset()
          md.update(row.media, from, win)
          WindowFeature(row.doc_id, j.toInt, e,
            md.digest().map("%02x".format(_)).mkString, nw)
        }
      }
    }
  }

  case class PHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Average-hash (aHash) perceptual fingerprint of an opaque raster blob —
    * the image near-dup primitive (pHash family): crop to the leading
    * `w`×`w` byte tile, 2×2 floor-mean downsample to 8×8, threshold each
    * cell at the floor-mean of the 64 cells (>=), and pack the bits into
    * FOUR 16-bit bands (band = row pair; bit position = (r%2)*8+c) — the
    * band split is the LSH blocking key downstream pair generation
    * equi-joins on, exactly as MinHash bands block text near-dups. Blobs
    * shorter than one tile emit nothing (no image, no hash). The mean
    * threshold is the stub kernel — a real pipeline swaps in a DCT (pHash
    * proper) without touching the shape. Exact integer arithmetic
    * throughout, so an oracle can re-derive every bit from the bytes. */
  def aHash(media: Dataset[MediaRow], w: Int = 16): Dataset[PHash] = {
    require(w == 16, s"aHash tile width must be 16 (8x8 cells at factor 2), got $w")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        if (row.media.length < w * w) Iterator.empty
        else {
          val v = new Array[Int](64)
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              val base = (r * 2) * w + c * 2
              v(r * 8 + c) = ((row.media(base) & 0xff) + (row.media(base + 1) & 0xff)
                + (row.media(base + w) & 0xff) + (row.media(base + w + 1) & 0xff)) / 4
              c += 1
            }
            r += 1
          }
          val mean = v.sum / 64
          val bands = new Array[Int](4)
          var i = 0
          while (i < 64) {
            if (v(i) >= mean) {
              val r8 = i / 8
              bands(r8 / 2) |= 1 << ((r8 % 2) * 8 + (i % 8))
            }
            i += 1
          }
          Iterator.single(PHash(row.doc_id, bands(0), bands(1), bands(2), bands(3)))
        }
      }
    }
  }

  /** aHash bands in the (band, band_hash, doc_id) long form the LSH
    * admission machinery consumes (EventStream.runLshAdmission) — the
    * image twin of the MinHash stagedBands adapter. Degenerate 0/0xffff
    * bands (uniform tiles) are dropped HERE so neither blocking joins nor
    * streaming ownership state ever key on them. Works on batch and
    * streaming frames alike (the kernel is a stateless mapPartitions). */
  def phashBands(docs: DataFrame): DataFrame =
    aHash(mediaFromDocuments(docs)).toDF()
      .select(col("doc_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band", "val")))
      .filter(col("val") =!= 0 && col("val") =!= 65535)
      .select(col("band"), col("val").cast("string").as("band_hash"),
        col("doc_id"))
}
