package graft.io

import org.apache.hadoop.conf.Configuration
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
      // the portable format orders high words UNSIGNED; a negative key
      // (row index >= 2^63) would break the signed binarySearch in
      // RoaringBitmapArray.contains — refuse loudly rather than silently
      // resurrect deleted rows (parquet row indexes never get there)
      require(highs(bi) >= 0, s"DV high word ${highs(bi)} out of supported range (< 2^63)")
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
    parse(loadBytes(spark.sparkContext.hadoopConfiguration, tableDir, descriptorJson)).toPositions

  /** Load one descriptor's bitmap as a queryable [[RoaringBitmapArray]]
    * — O(bitmap bytes), the masked-read unit. */
  def loadBitmap(spark: SparkSession, tableDir: String,
                 descriptorJson: String): RoaringBitmapArray =
    parse(loadBytes(spark.sparkContext.hadoopConfiguration, tableDir, descriptorJson))

  /** Configuration-keyed twin of [[loadBitmap]] — the executor-side
    * unit (distributed DV authoring merges OLD bitmaps on executors,
    * where no SparkSession exists). */
  def loadBitmap(conf: Configuration, tableDir: String,
                 descriptorJson: String): RoaringBitmapArray =
    parse(loadBytes(conf, tableDir, descriptorJson))

  /** The raw portable-serialization bytes of one descriptor's bitmap:
    * inline ("i") payloads decode in place; sidecar ("u") and absolute
    * ("p") storage read the length-prefixed, CRC-checked frame. */
  private def loadBytes(conf: Configuration, tableDir: String,
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
        val f = path.getFileSystem(conf)
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
    * action's descriptor JSON (storageType "u"). Positions-array
    * convenience over [[writeSidecar(conf*]] — fixtures and small DVs;
    * the distributed authoring path passes pre-serialized bitmap bytes
    * and never materializes positions. */
  def writeSidecar(spark: SparkSession, tableDir: String,
                   positions: Array[Long]): String =
    writeSidecar(spark.sparkContext.hadoopConfiguration, tableDir,
      serialize(positions), positions.length.toLong)

  /** Write one DV sidecar from ALREADY-SERIALIZED portable bitmap bytes
    * — the executor-side unit ([[graft.io.DeltaInterop.deleteWhereDV]]
    * builds per-file bitmaps distributed and writes each sidecar on the
    * executor that aggregated it; only the returned descriptor JSON
    * travels to the driver). Frame: version byte 1, 4-byte BE length,
    * bitmap bytes, 4-byte BE CRC32 — the delta-spark on-disk DV file
    * layout. */
  def writeSidecar(conf: Configuration, tableDir: String,
                   data: Array[Byte], cardinality: Long): String = {
    val uuid = java.util.UUID.randomUUID()
    val path = new Path(tableDir, s"deletion_vector_$uuid.bin")
    val f = path.getFileSystem(conf)
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
    s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":1,"sizeInBytes":${data.length},"cardinality":$cardinality}"""
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

  /** Visit every set position in ascending order — O(cardinality), no
    * intermediate array (the bitmap-to-bitmap merge unit). */
  def foreach(emit: Long => Unit): Unit = {
    var i = 0
    while (i < highs.length) {
      val high = (highs(i).toLong & 0xffffffffL) << 32
      maps(i).foreach(v => emit(high | (v.toLong & 0xffffffffL)))
      i += 1
    }
  }

  /** Expand to sorted positions — O(cardinality); write-path only. */
  def toPositions: Array[Long] = {
    val out = Array.newBuilder[Long]
    foreach(out += _)
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

/** Mutable RoaringBitmapArray under construction — the DV AUTHORING
  * unit. Executors accumulate deleted row indexes into this inside
  * [[graft.functions.expressions.DvBitmapAgg]] (a
  * TypedImperativeAggregate: map-side partial bitmaps merge at the
  * shuffle, so the exchange moves O(bitmap bytes) per file, never
  * O(deleted positions) rows), then OR in the file's OLD bitmap and
  * emit the portable serialization. Memory is roaring-shaped: each
  * 2^16-row chunk holds either a growable u16 array (≤ 4096 lows) or
  * an 8 KiB bit set — a 100 M-position DV is a few MB, and NOTHING here
  * ever touches the driver (positions stay on the executor that
  * aggregated them).
  *
  * Not thread-safe (one aggregation buffer per task, Spark's contract).
  */
final class RoaringBitmapBuilder {
  import RoaringBitmapBuilder.LowBuf

  // container id = position >>> 16 (high-32 word ++ u16 container key);
  // payload: LowBuf (array container, sorted+deduped at result()) or
  // Array[Long](1024) (bitmap container)
  private val containers = scala.collection.mutable.LongMap.empty[AnyRef]

  def add(pos: Long): Unit = {
    require(pos >= 0, s"negative DV row index $pos")
    val cid = pos >>> 16
    val low = (pos & 0xffffL).toInt
    containers.getOrNull(cid) match {
      case null =>
        val b = new LowBuf(new Array[Char](16), 0)
        b.arr(0) = low.toChar; b.n = 1
        containers(cid) = b
      case w: Array[Long] =>
        w(low >>> 6) |= 1L << (low & 63)
      case b: LowBuf =>
        if (b.n >= 4096) { // upgrade to a bitmap container
          val w = new Array[Long](1024)
          var i = 0
          while (i < b.n) { val x = b.arr(i); w(x >>> 6) |= 1L << (x & 63); i += 1 }
          w(low >>> 6) |= 1L << (low & 63)
          containers(cid) = w
        } else {
          if (b.n == b.arr.length) {
            val na = new Array[Char](b.arr.length * 2)
            System.arraycopy(b.arr, 0, na, 0, b.n)
            b.arr = na
          }
          b.arr(b.n) = low.toChar; b.n += 1
        }
    }
  }

  /** OR in a parsed (immutable) bitmap — the old-DV merge. */
  def or(other: RoaringBitmapArray): Unit = other.foreach(add)

  /** OR in another builder (aggregate-merge). Container-level for
    * bitmap payloads; safe to share arrays — `other` is discarded. */
  def merge(other: RoaringBitmapBuilder): Unit =
    other.containers.foreach { case (cid, payload) =>
      containers.getOrNull(cid) match {
        case null => containers(cid) = payload
        case mineW: Array[Long] =>
          payload match {
            case w: Array[Long] =>
              var i = 0
              while (i < 1024) { mineW(i) |= w(i); i += 1 }
            case b: LowBuf =>
              var i = 0
              while (i < b.n) { val x = b.arr(i); mineW(x >>> 6) |= 1L << (x & 63); i += 1 }
          }
        case _ =>
          val base = cid << 16
          payload match {
            case w: Array[Long] =>
              var wi = 0
              while (wi < 1024) {
                var word = w(wi); var bit = 0
                while (word != 0) {
                  if ((word & 1L) != 0) add(base | (wi * 64 + bit))
                  word >>>= 1; bit += 1
                }
                wi += 1
              }
            case b: LowBuf =>
              var i = 0
              while (i < b.n) { add(base | b.arr(i)); i += 1 }
          }
      }
    }

  /** Finalize: (portable RoaringBitmapArray bytes, exact cardinality).
    * Sorts + dedups array containers in place; idempotent. */
  def result(): (Array[Byte], Long) = {
    val cids = containers.keysIterator.toArray
    java.util.Arrays.sort(cids) // cids >= 0 (pos >= 0), signed sort == unsigned
    var card = 0L
    // finalize payloads: (cid, containerCard, lows extractor)
    val finals = cids.map { cid =>
      containers(cid) match {
        case w: Array[Long] =>
          var c = 0
          var i = 0
          while (i < 1024) { c += java.lang.Long.bitCount(w(i)); i += 1 }
          card += c
          (cid, c, w: AnyRef)
        case b: LowBuf =>
          java.util.Arrays.sort(b.arr, 0, b.n)
          // dedup in place (defensive — authoring inputs are unique)
          var out = 0
          var i = 0
          while (i < b.n) {
            if (out == 0 || b.arr(i) != b.arr(out - 1)) { b.arr(out) = b.arr(i); out += 1 }
            i += 1
          }
          b.n = out
          card += out
          (cid, out, b: AnyRef)
      }
    }
    // group consecutive cids by high-32 word into per-high 32-bit bitmaps
    val byHigh = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[(Int, Int, AnyRef)])]
    var s = 0
    while (s < finals.length) {
      val high = (finals(s)._1 >>> 16).toInt
      var e = s
      while (e < finals.length && (finals(e)._1 >>> 16).toInt == high) e += 1
      byHigh += ((high, finals.slice(s, e).map { case (cid, c, p) =>
        ((cid & 0xffffL).toInt, c, p) }))
      s = e
    }
    val bitmaps = byHigh.map { case (high, conts) => (high, writeBitmap32(conts)) }
    val total = 4 + 8 + bitmaps.map(4 + _._2.length).sum
    val out = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putInt(DeletionVectors.PortableMagic)
    out.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (high, bytes) => out.putInt(high); out.put(bytes) }
    (out.array(), card)
  }

  // one standard 32-bit roaring bitmap (cookie 12346, array/bitmap
  // containers, offset table) — mirrors DeletionVectors.writeBitmap32
  // but emits straight from finalized container payloads
  private def writeBitmap32(conts: Array[(Int, Int, AnyRef)]): Array[Byte] = {
    val n = conts.length
    val payloadLen = conts.map { case (_, c, p) =>
      p match { case _: Array[Long] if c > 4096 => 8192; case _ => c * 2 }
    }
    val size = 4 + 4 + n * 4 + n * 4 + payloadLen.sum
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
    b.putInt(n)
    conts.foreach { case (key, c, _) =>
      b.putShort(key.toShort); b.putShort((c - 1).toShort)
    }
    var off = 4 + 4 + n * 4 + n * 4
    var i = 0
    while (i < n) { b.putInt(off); off += payloadLen(i); i += 1 }
    conts.foreach { case (_, c, p) =>
      p match {
        case w: Array[Long] if c > 4096 => w.foreach(b.putLong)
        case w: Array[Long] => // small bitmap container -> canonical array form
          var wi = 0
          while (wi < 1024) {
            var word = w(wi); var bit = 0
            while (word != 0) {
              if ((word & 1L) != 0) b.putShort(((wi << 6) | bit).toShort)
              word >>>= 1; bit += 1
            }
            wi += 1
          }
        case lb: LowBuf =>
          var i2 = 0
          while (i2 < lb.n) { b.putShort(lb.arr(i2).toShort); i2 += 1 }
      }
    }
    b.array()
  }
}

object RoaringBitmapBuilder {
  private[io] final class LowBuf(var arr: Array[Char], var n: Int)

  /** Rehydrate from portable bytes (aggregate-buffer deserialization at
    * shuffle boundaries). */
  def fromBytes(bytes: Array[Byte]): RoaringBitmapBuilder = {
    val b = new RoaringBitmapBuilder
    b.or(DeletionVectors.parse(bytes))
    b
  }
}

/** Java-serializable Hadoop Configuration carrier (Configuration itself
  * is Writable but not Serializable) — lets executor-side DV sidecar
  * writes resolve the right FileSystem. Same shape as Spark's internal
  * util; reimplemented here because that one is `private[spark]`. */
final class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
