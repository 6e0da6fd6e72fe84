package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.{ByteBuffer, ByteOrder}

/** Delta deletion vectors (PROTOCOL.md "Deletion Vectors"): a row-level
  * tombstone attached to an `add` action — `deletionVector:
  * {storageType, pathOrInlineDv, offset, sizeInBytes, cardinality}` —
  * marking row INDICES of the data file as deleted without rewriting
  * it (reader version 3, `deletionVectors` reader feature). The bitmap
  * is a RoaringBitmapArray in the protocol's portable serialization,
  * stored either inline (Z85-encoded in the action) or in a
  * `deletion_vector_<uuid>.bin` sidecar file.
  *
  * graft WRITES plain v2 tables (row ops are copy-on-write), but must
  * READ DV tables: any delta-spark table that ran a DV-enabled DELETE
  * or MERGE carries them. Scale shape: masked reads parse each
  * descriptor into a QUERYABLE [[RoaringBitmapArray]] — container
  * structure kept compressed, O(bitmap bytes), never O(positions)
  * rows — and ship the per-file bitmaps to executors inside a codegen
  * `contains(row_index)` filter predicate, mirroring delta-spark's
  * per-task `__delta_internal_is_row_deleted` shape. Positions are
  * only ever materialized when WRITING a new descriptor (serializing
  * a bitmap is inherently O(its cardinality)).
  */
object DeletionVectors {

  // ---- Z85 (ZeroMQ base85, the protocol's DV path/inline encoding) ----

  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85-encode (input length must be a multiple of 4). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) { sb.append(Z85Chars(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  /** Z85-decode (input length must be a multiple of 5). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Index(c.toInt) else -1
        require(d >= 0, s"invalid Z85 char '$c'")
        v = v * 85 + d
        j += 1
      }
      var shift = 24
      while (shift >= 0) { out(o) = ((v >> shift) & 0xff).toByte; o += 1; shift -= 8 }
      i += 5
    }
    out
  }

  // ---- RoaringBitmapArray portable serialization (PROTOCOL.md) ----
  // [magic 4B LE = 1681511377][number of 32-bit bitmaps 8B LE] then per
  // bitmap: [key 4B LE][standard 32-bit RoaringBitmap portable bytes].
  // The 32-bit format (RoaringFormatSpec): cookie 12346 (no runs) or
  // 12347 (runs, size-1 in the high 16 bits), container headers
  // (key u16, cardinality-1 u16), optional run marker bitset, optional
  // offsets, then container payloads (array = u16s, bitmap = 8 KiB,
  // run = u16 count + (start,length-1) u16 pairs).

  val PortableMagic = 1681511377

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Deserialize a portable RoaringBitmapArray into sorted row indices.
    * O(cardinality) output — use [[parse]] for a queryable bitmap that
    * stays O(bitmap bytes). */
  def deserialize(bytes: Array[Byte]): Array[Long] = parse(bytes).toPositions

  /** Parse the portable serialization into a queryable
    * [[RoaringBitmapArray]] — container structure preserved (array /
    * bitmap / run), never expanded to positions. */
  def parse(bytes: Array[Byte]): RoaringBitmapArray = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = b.getInt
    require(magic == PortableMagic, s"bad RoaringBitmapArray magic $magic")
    val nBitmaps = b.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val highs = new Array[Int](nBitmaps.toInt)
    val maps = new Array[RoaringBitmapArray.Bitmap32](nBitmaps.toInt)
    var bi = 0
    while (bi < nBitmaps) {
      highs(bi) = b.getInt
      maps(bi) = readBitmap32(b)
      bi += 1
    }
    new RoaringBitmapArray(highs, maps)
  }

  private def readBitmap32(b: ByteBuffer): RoaringBitmapArray.Bitmap32 = {
    val cookie = b.getInt
    val (nContainers, hasRun) =
      if ((cookie & 0xffff) == SerialCookie) (((cookie >>> 16) & 0xffff) + 1, true)
      else {
        require(cookie == SerialCookieNoRun, s"bad RoaringBitmap cookie $cookie")
        (b.getInt, false)
      }
    val runFlags: Array[Boolean] =
      if (hasRun) {
        val nBytes = (nContainers + 7) / 8
        val flags = new Array[Boolean](nContainers)
        var i = 0
        while (i < nBytes) {
          val byte = b.get() & 0xff
          var bit = 0
          while (bit < 8 && i * 8 + bit < nContainers) {
            flags(i * 8 + bit) = ((byte >> bit) & 1) == 1
            bit += 1
          }
          i += 1
        }
        flags
      } else new Array[Boolean](nContainers)
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = b.getShort & 0xffff
      cards(i) = (b.getShort & 0xffff) + 1
      i += 1
    }
    // offsets present unless (run-format and few containers)
    if (!hasRun || nContainers >= NoOffsetThreshold) {
      var skip = 0
      while (skip < nContainers) { b.getInt; skip += 1 } // we read sequentially
    }
    val payloads = new Array[AnyRef](nContainers)
    i = 0
    while (i < nContainers) {
      if (runFlags(i)) {
        val nRuns = b.getShort & 0xffff
        val runs = new Array[Int](nRuns * 2) // [start, lastInclusive] pairs
        var r = 0
        while (r < nRuns) {
          val start = b.getShort & 0xffff
          val len = b.getShort & 0xffff
          runs(2 * r) = start
          runs(2 * r + 1) = start + len
          r += 1
        }
        payloads(i) = runs
      } else if (cards(i) > 4096) {
        val words = new Array[Long](1024)
        var w = 0
        while (w < 1024) { words(w) = b.getLong; w += 1 }
        payloads(i) = words
      } else {
        val vals = new Array[Char](cards(i))
        var c = 0
        while (c < cards(i)) { vals(c) = (b.getShort & 0xffff).toChar; c += 1 }
        payloads(i) = vals
      }
      i += 1
    }
    new RoaringBitmapArray.Bitmap32(keys, payloads)
  }

  /** Serialize sorted distinct row indices as a portable
    * RoaringBitmapArray (array or bitmap containers; runs never
    * emitted). Used by test fixtures and any DV-authoring tool. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    val byHigh = sorted.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmapBytes = byHigh.map { case (high, vs) =>
      (high, writeBitmap32(vs.map(v => (v & 0xffffffffL).toInt)))
    }
    val total = 4 + 8 + bitmapBytes.map(4 + _._2.length).sum
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(PortableMagic)
    b.putLong(byHigh.size.toLong)
    bitmapBytes.foreach { case (high, bytes) => b.putInt(high); b.put(bytes) }
    b.array()
  }

  private def writeBitmap32(values: Array[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
    val n = byKey.size
    val payloads = byKey.map { case (key, vs) =>
      val lows = vs.map(_ & 0xffff).sorted
      if (lows.length > 4096) {
        val words = new Array[Long](1024)
        lows.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        val pb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(pb.putLong)
        (key, lows.length, pb.array())
      } else {
        val pb = ByteBuffer.allocate(lows.length * 2).order(ByteOrder.LITTLE_ENDIAN)
        lows.foreach(v => pb.putShort(v.toShort))
        (key, lows.length, pb.array())
      }
    }
    val size = 4 + 4 + n * 4 + n * 4 + payloads.map(_._3.length).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(SerialCookieNoRun)
    b.putInt(n)
    payloads.foreach { case (key, card, _) =>
      b.putShort(key.toShort); b.putShort((card - 1).toShort)
    }
    var off = 4 + 4 + n * 4 + n * 4
    payloads.foreach { case (_, _, p) => b.putInt(off); off += p.length }
    payloads.foreach { case (_, _, p) => b.put(p) }
    b.array()
  }

  // ---- DV descriptor resolution ----

  /** `[prefix]<z85 uuid>` payload → table-root-relative sidecar path
    * (`deletion_vector_<uuid>.bin`, optionally under a prefix dir). */
  def sidecarRelFromPayload(payload: String): String = {
    val (prefix, enc) =
      if (payload.length > 20) (payload.dropRight(20), payload.takeRight(20))
      else ("", payload)
    val raw = z85Decode(enc)
    val bb = ByteBuffer.wrap(raw)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) name else s"$prefix/$name"
  }

  /** The table-root-relative sidecar file a descriptor references, or
    * None for inline ("i") and absolute ("p") storage — the reachability
    * set [[graft.io.DeltaInterop.vacuum]] uses to GC orphaned DV files. */
  def sidecarRelPath(descriptorJson: String): Option[String] = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = M.readTree(descriptorJson)
    n.get("storageType").asText match {
      case "u" => Some(sidecarRelFromPayload(n.get("pathOrInlineDv").asText))
      case _ => None
    }
  }

  /** Load the deleted row indices for one `deletionVector` descriptor
    * (raw JSON node text). `tableDir` anchors relative ("u") storage.
    * O(cardinality) — the WRITE-path unit (merging into a new
    * descriptor); masked READS use [[loadBitmap]]. */
  def loadPositions(spark: SparkSession, tableDir: String,
                    descriptorJson: String): Array[Long] =
    parse(loadBytes(spark, tableDir, descriptorJson)).toPositions

  /** Load one descriptor's bitmap as a queryable [[RoaringBitmapArray]]
    * — O(bitmap bytes), the masked-read unit. */
  def loadBitmap(spark: SparkSession, tableDir: String,
                 descriptorJson: String): RoaringBitmapArray =
    parse(loadBytes(spark, tableDir, descriptorJson))

  /** The raw portable-serialization bytes of one descriptor's bitmap:
    * inline ("i") payloads decode in place; sidecar ("u") and absolute
    * ("p") storage read the length-prefixed, CRC-checked frame. */
  private def loadBytes(spark: SparkSession, tableDir: String,
                        descriptorJson: String): Array[Byte] = {
    val M = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = M.readTree(descriptorJson)
    val storage = n.get("storageType").asText
    val payload = n.get("pathOrInlineDv").asText
    storage match {
      case "i" => // inline: Z85 of the serialized bitmap
        z85Decode(payload)
      case "u" | "p" =>
        val path = storage match {
          case "p" => new Path(payload)
          case _ => new Path(tableDir, sidecarRelFromPayload(payload))
        }
        val offset = if (n.has("offset")) n.get("offset").asInt else 0
        val size = n.get("sizeInBytes").asInt
        val f = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val in = f.open(path)
        try {
          in.seek(offset.toLong)
          val szBuf = new Array[Byte](4)
          in.readFully(szBuf)
          val sz = ByteBuffer.wrap(szBuf).getInt // big-endian length prefix
          require(sz == size,
            s"DV size mismatch at $path+$offset: header $sz vs descriptor $size")
          val data = new Array[Byte](sz)
          in.readFully(data)
          val crcBuf = new Array[Byte](4)
          in.readFully(crcBuf)
          val crc = new java.util.zip.CRC32()
          crc.update(data)
          require(ByteBuffer.wrap(crcBuf).getInt == crc.getValue.toInt,
            s"DV checksum mismatch at $path+$offset")
          data
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(s"unknown DV storageType '$other'")
    }
  }

  /** Write a DV sidecar file holding one bitmap and return the `add`
    * action's descriptor JSON (storageType "u"). Fixture/authoring
    * helper — the production row ops stay copy-on-write. */
  def writeSidecar(spark: SparkSession, tableDir: String,
                   positions: Array[Long]): String = {
    val uuid = java.util.UUID.randomUUID()
    val data = serialize(positions)
    val path = new Path(tableDir, s"deletion_vector_$uuid.bin")
    val f = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(path, false)
    try {
      out.write(1) // format version byte
      val head = ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(head)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    } finally out.close()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val enc = z85Encode(bb.array())
    s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":1,"sizeInBytes":${data.length},"cardinality":${positions.length}}"""
  }
}

/** A parsed-but-not-expanded RoaringBitmapArray: the DV's own container
  * structure (array / bitmap / run per 2^16-value chunk), queryable with
  * [[contains]] in O(log containers). Memory is O(serialized bytes) —
  * a 100 M-position DV is its few-MB bitmap, never 100 M driver rows.
  * Serializable: ships to executors inside the masked-scan filter
  * predicate ([[graft.functions.expressions.DvDeletedExpr]]). */
final class RoaringBitmapArray private[io] (
    highs: Array[Int], maps: Array[RoaringBitmapArray.Bitmap32])
  extends Serializable {

  /** Is 64-bit row index `v` in the bitmap? */
  def contains(v: Long): Boolean = {
    val i = java.util.Arrays.binarySearch(highs, (v >>> 32).toInt)
    i >= 0 && maps(i).contains((v & 0xffffffffL).toInt)
  }

  /** Total number of set positions (sums container cardinalities). */
  def cardinality: Long = maps.iterator.map(_.cardinality).sum

  /** Expand to sorted positions — O(cardinality); write-path only. */
  def toPositions: Array[Long] = {
    val out = Array.newBuilder[Long]
    var i = 0
    while (i < highs.length) {
      val high = (highs(i).toLong & 0xffffffffL) << 32
      maps(i).foreach(v => out += (high | (v.toLong & 0xffffffffL)))
      i += 1
    }
    out.result()
  }
}

object RoaringBitmapArray {

  /** One 32-bit roaring bitmap: sorted container keys (high 16 bits)
    * plus per-container payloads — `Array[Char]` = sorted array
    * container, `Array[Long]`(1024) = bitmap container, `Array[Int]` =
    * run container as [start, lastInclusive] pairs. */
  private[io] final class Bitmap32(keys: Array[Int], payloads: Array[AnyRef])
    extends Serializable {

    def contains(v: Int): Boolean = {
      val i = java.util.Arrays.binarySearch(keys, (v >>> 16) & 0xffff)
      if (i < 0) return false
      val low = v & 0xffff
      payloads(i) match {
        case a: Array[Char] =>
          java.util.Arrays.binarySearch(a, low.toChar) >= 0
        case w: Array[Long] =>
          (w(low >>> 6) & (1L << (low & 63))) != 0
        case r: Array[Int] =>
          // binary search the run STARTS, then check the run's end
          var lo = 0
          var hi = r.length / 2 - 1
          var hit = false
          while (lo <= hi && !hit) {
            val mid = (lo + hi) >>> 1
            if (low < r(2 * mid)) hi = mid - 1
            else if (low > r(2 * mid + 1)) lo = mid + 1
            else hit = true
          }
          hit
      }
    }

    def cardinality: Long = {
      var total = 0L
      payloads.foreach {
        case a: Array[Char] => total += a.length
        case w: Array[Long] => w.foreach(total += java.lang.Long.bitCount(_))
        case r: Array[Int] =>
          var i = 0
          while (i < r.length) { total += r(i + 1) - r(i) + 1; i += 2 }
      }
      total
    }

    def foreach(emit: Int => Unit): Unit = {
      var i = 0
      while (i < keys.length) {
        val base = keys(i) << 16
        payloads(i) match {
          case a: Array[Char] => a.foreach(c => emit(base | c))
          case words: Array[Long] =>
            var w = 0
            while (w < 1024) {
              var word = words(w)
              var bit = 0
              while (word != 0) {
                if ((word & 1L) != 0) emit(base | (w * 64 + bit))
                word >>>= 1
                bit += 1
              }
              w += 1
            }
          case r: Array[Int] =>
            var ri = 0
            while (ri < r.length) {
              var v = r(ri)
              while (v <= r(ri + 1)) { emit(base | v); v += 1 }
              ri += 2
            }
        }
        i += 1
      }
    }
  }
}
