package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * batched partition-local transforms (the Scala analogue of a Pandas UDF
  * over mapInPandas: one JVM-side pass per partition, vectorizable batch
  * shape, no per-row driver involvement).
  *
  * Decode: THREE real formats are implemented, all pure JVM with no
  * external libs — uncompressed 24/32-bit BMP (`decodeBmp`), 8-bit
  * non-interlaced PNG (`decodePng`, zlib via `java.util.zip.Inflater`,
  * full scanline unfiltering), and RIFF/WAVE integer PCM audio
  * (`decodeWav`) — and every other payload falls back to `decodeStub`,
  * a deterministic fake (no JPEG/Opus/video codecs ship in this
  * container). Schema, binary transport, partition batching and feature
  * shape are identical on all paths, so further real decoders drop into
  * the same seam without touching the plumbing.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       channels: Int, features: Array[Float])

  /** Deterministic fake decode: metadata from byte length, features from
    * a strided byte sample (stands in for `???` — a real JPEG/PNG decode).
    */
  def decodeStub(id: Long, bytes: Array[Byte], featDim: Int): MediaMeta = {
    val n = bytes.length
    val width = 64 + (n % 577)
    val height = 64 + ((n / 7) % 449)
    val channels = 1 + (n % 3)
    val stride = math.max(1, n / featDim)
    val feats = Array.tabulate(featDim) { i =>
      val off = i * stride
      if (off < n) (bytes(off) & 0xFF).toFloat / 255.0f else 0.0f
    }
    MediaMeta(id, n, width, height, channels, feats)
  }

  /** Real decode of one format: uncompressed 24/32-bit BMP
    * (BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, BI_RGB). Returns None
    * for anything else. Validation is strict — magic, header size, plane
    * count, compression, and dimensions consistent with the actual byte
    * count — so arbitrary text/binary payloads cannot false-positive into
    * the real-decode path.
    *
    * Features: mean pixel intensity of ONE sampled row per horizontal
    * band (`featDim` bands, top to bottom; BMP rows are stored bottom-up
    * for positive heights), in [0, 1] — a real, deterministic image
    * statistic at O(featDim · width) cost regardless of image height.
    */
  def decodeBmp(id: Long, bytes: Array[Byte], featDim: Int): Option[MediaMeta] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def i32(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val pixOff = i32(10)
    val hdrSize = i32(14)
    val width = i32(18)
    val height = i32(22)
    val planes = u16(26)
    val bpp = u16(28)
    val compression = i32(30)
    if (hdrSize != 40 || planes != 1 || compression != 0) return None
    // dimension sanity caps BEFORE any arithmetic: adversarial headers
    // otherwise overflow 32-bit products (width*channels negative,
    // math.abs(Int.MinValue) still negative) and slip past the byte-count
    // check into out-of-bounds reads — a corrupt payload must fall back
    // to the stub, never fail the job
    val MaxDim = 1 << 20
    if (width <= 0 || width > MaxDim || height == 0 ||
        height == Int.MinValue || math.abs(height) > MaxDim ||
        (bpp != 24 && bpp != 32)) return None
    val rows = math.abs(height)
    val channels = bpp / 8
    val rowBytes = ((width * channels + 3) / 4) * 4 // rows pad to 4 bytes
    if (pixOff < 54 ||
        pixOff.toLong + rows.toLong * rowBytes > bytes.length) return None
    val feats = new Array[Float](featDim)
    var f = 0
    while (f < featDim) {
      val r = (f.toLong * rows / featDim).toInt // image row, top to bottom
      val storageRow = if (height > 0) rows - 1 - r else r
      val rowStart = pixOff + storageRow * rowBytes
      var sum = 0L
      var x = 0
      while (x < width * channels) { sum += (bytes(rowStart + x) & 0xFF); x += 1 }
      feats(f) = (sum.toDouble / (width * channels) / 255.0).toFloat
      f += 1
    }
    Some(MediaMeta(id, bytes.length, width, rows, channels, feats))
  }

  /** Real decode of PNG (8-bit greyscale/RGB/RGBA, non-interlaced) —
    * pure JVM: zlib inflate via `java.util.zip.Inflater`, full scanline
    * unfiltering (None/Sub/Up/Average/Paeth), CRC-verified chunks.
    * Returns None for anything else (palette, 16-bit, interlaced, bad
    * CRC, truncated, or dimensions whose pixel buffer would exceed the
    * decode cap — a zip-bomb IDAT cannot balloon memory).
    *
    * Features: as decodeBmp — mean intensity of one sampled row per
    * horizontal band, top to bottom, in [0, 1].
    */
  def decodePng(id: Long, bytes: Array[Byte], featDim: Int): Option[MediaMeta] = {
    def i32(o: Int): Int = ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
      ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF) // PNG is big-endian
    val Sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    if (bytes.length < 45 || !bytes.take(8).sameElements(Sig)) return None
    var off = 8
    var width = 0
    var height = 0
    var channels = 0
    var sawIhdr = false
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 12 <= bytes.length && !sawIend) {
      val len = i32(off)
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      if (len < 0 || off + 12L + len > bytes.length) return None
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue.toInt != i32(off + 8 + len)) return None
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = i32(off + 8)
          height = i32(off + 12)
          val bitDepth = bytes(off + 16) & 0xFF
          val colorType = bytes(off + 17) & 0xFF
          val (compression, filterM, interlace) =
            (bytes(off + 18) & 0xFF, bytes(off + 19) & 0xFF, bytes(off + 20) & 0xFF)
          channels = colorType match {
            case 0 => 1 case 2 => 3 case 6 => 4 case _ => return None
          }
          if (bitDepth != 8 || compression != 0 || filterM != 0 ||
              interlace != 0 || width <= 0 || height <= 0) return None
          // decode cap: raw buffer ≤ 64 MB regardless of claimed dims
          if ((1L + width.toLong * channels) * height > (64L << 20)) return None
          sawIhdr = true
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunks skipped
      }
      off += 12 + len
    }
    if (!sawIhdr || !sawIend || idat.size == 0) return None
    val rowBytes = width * channels
    val raw = new Array[Byte]((1 + rowBytes) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 with input still pending covers truncated streams AND
        // FDICT (preset-dictionary) zlib streams, where inflate() stalls
        // with needsInput()==false — looping on either would spin the
        // executor task forever. Both are malformed for PNG: bail.
        if (n == 0) return None
        got += n
      }
    } finally inf.end() // release the native zlib buffer on every path
    if (got != raw.length) return None
    // unfilter in place into pix (scanline filters are defined on the
    // bytes of the PREVIOUS unfiltered row and the pixel to the left)
    val pix = new Array[Byte](rowBytes * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + rowBytes)) & 0xFF
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val rv = raw(src + x) & 0xFF
        val a = if (x >= bpp) pix(dst + x - bpp) & 0xFF else 0
        val b = if (y > 0) pix(dst - rowBytes + x) & 0xFF else 0
        val c = if (x >= bpp && y > 0) pix(dst - rowBytes + x - bpp) & 0xFF else 0
        val out = ft match {
          case 0 => rv
          case 1 => rv + a
          case 2 => rv + b
          case 3 => rv + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        pix(dst + x) = out.toByte
        x += 1
      }
      y += 1
    }
    val feats = new Array[Float](featDim)
    var f = 0
    while (f < featDim) {
      val r = (f.toLong * height / featDim).toInt
      var sum = 0L
      var x = 0
      while (x < rowBytes) { sum += (pix(r * rowBytes + x) & 0xFF); x += 1 }
      feats(f) = (sum.toDouble / rowBytes / 255.0).toFloat
      f += 1
    }
    Some(MediaMeta(id, bytes.length, width, height, channels, feats))
  }

  /** Real decode of a second modality: RIFF/WAVE PCM audio (8- or 16-bit
    * integer PCM, the `fmt ` + `data` chunk layout). Returns None for
    * anything else — validation is strict (magic, chunk walk bounded by
    * the byte count, PCM format code, sane channel/rate/width, data size
    * consistent with block alignment) so arbitrary payloads cannot
    * false-positive.
    *
    * MediaMeta mapping for audio: width = sample rate (Hz), height =
    * frames, channels = channels. Features: mean absolute amplitude (in
    * [0, 1], full scale = 1) of `featDim` equal temporal bands, each
    * band sampled at ≤ 1024 evenly-spaced frames — a real loudness
    * envelope at bounded cost regardless of clip length.
    */
  def decodeWav(id: Long, bytes: Array[Byte], featDim: Int): Option[MediaMeta] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def i32(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // chunk walk: fmt before data, both inside the payload
    var off = 12
    var fmtOff = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val cid = tag(off)
      val clen = i32(off + 4)
      if (clen < 0 || off + 8 + clen.toLong > bytes.length) return None
      if (cid == "fmt " && clen >= 16) fmtOff = off + 8
      else if (cid == "data") { dataOff = off + 8; dataLen = clen }
      off += 8 + clen + (clen & 1) // chunks pad to even length
    }
    if (fmtOff < 0 || dataOff < 0) return None
    val audioFormat = u16(fmtOff)
    val channels = u16(fmtOff + 2)
    val sampleRate = i32(fmtOff + 4)
    val bits = u16(fmtOff + 14)
    if (audioFormat != 1 || channels < 1 || channels > 8 ||
        sampleRate <= 0 || sampleRate > 1000000 ||
        (bits != 8 && bits != 16)) return None
    val bytesPerFrame = channels * (bits / 8)
    val frames = dataLen / bytesPerFrame
    if (frames <= 0) return None
    val feats = new Array[Float](featDim)
    val bandFrames = math.max(1L, frames.toLong / featDim)
    var f = 0
    while (f < featDim) {
      val from = f.toLong * frames / featDim
      val until = math.min(frames.toLong, from + bandFrames)
      val step = math.max(1L, (until - from) / 1024)
      var sum = 0.0
      var n = 0L
      var fr = from
      while (fr < until) {
        var c = 0
        while (c < channels) {
          val o = dataOff + fr * bytesPerFrame + c * (bits / 8)
          val amp =
            if (bits == 8) math.abs((bytes(o.toInt) & 0xFF) - 128) / 128.0
            else math.abs(u16(o.toInt).toShort.toInt) / 32768.0
          sum += amp
          c += 1
        }
        n += channels
        fr += step
      }
      feats(f) = (sum / n).toFloat
      f += 1
    }
    Some(MediaMeta(id, bytes.length, sampleRate, frames, channels, feats))
  }

  /** (doc_id, payload binary) → typed metadata + feature vector, one
    * partition-local batch pass. Real BMP / WAV decode when the payload
    * is one; deterministic stub otherwise.
    */
  def extract(media: DataFrame, featDim: Int = 8): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        // defense in depth: a malformed payload must degrade to the
        // stub, never fail the partition
        scala.util.Try(decodeBmp(id, b, featDim)).toOption.flatten
          .orElse(scala.util.Try(decodePng(id, b, featDim)).toOption.flatten)
          .orElse(scala.util.Try(decodeWav(id, b, featDim)).toOption.flatten)
          .getOrElse(decodeStub(id, b, featDim))
      })
  }

  /** Frame sampling stand-in: take every `stride`-th byte as a "frame" and
    * emit (doc_id, frame_idx, frame_byte) rows — the row-explosion shape a
    * real video frame sampler produces.
    */
  def frameSample(media: DataFrame, stride: Int = 64,
                  maxFrames: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        (0 until math.min(maxFrames, b.length / stride)).map { f =>
          (id, f, b(f * stride) & 0xFF)
        }
      }.toDF("doc_id", "frame_idx", "frame_byte")
  }
}
