package graft.io

import org.apache.spark.sql.types._

/** Apache Iceberg PARTITION TRANSFORMS (iceberg.apache.org/spec/
  * "Partition Transforms" + Appendix B "32-bit Hash Requirements"):
  * the value-side math that lets hidden partitioning prune. A real
  * Iceberg table is rarely identity-partitioned — `day(ts)`,
  * `bucket(N, id)` and `truncate(W, s)` dominate — and each manifest
  * summarises the TRANSFORMED partition values, so pruning a source
  * predicate requires mapping it through the transform:
  *
  *   - temporal (`year|month|day|hour`) and numeric `truncate[W]` are
  *     MONOTONE: a source range [lo,hi] maps to the transformed range
  *     [t(lo),t(hi)] and overlap-checks against the summary bounds;
  *   - `bucket[N]` destroys order: only POINT predicates prune, by
  *     hashing the value with the spec's murmur3_x86_32 (seed 0) over
  *     the spec's byte encodings;
  *   - string `truncate[W]` keeps PREFIX order: an equality literal
  *     truncates to W chars and bound-checks lexicographically.
  *
  * At 100 TB this is the difference between the driver opening every
  * manifest Avro and opening only the partitions a query names — the
  * same metadata-scale lever as Delta's checkpoint partition pruning.
  * The hash is implemented from the public Murmur3 algorithm and
  * pinned by the spec's own published test vectors
  * (IcebergTransformsSpec). */
object IcebergTransforms {

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  // ───────────────────────── murmur3_x86_32 ─────────────────────────

  /** Murmur3 x86 32-bit (Austin Appleby's public algorithm), seed 0 —
    * exactly the hash Iceberg's `bucket[N]` requires. */
  def murmur3(bytes: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = bytes.length
    var h = seed
    var i = 0
    while (i + 4 <= len) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (len & 3) match {
      case 3 =>
        k ^= (bytes(i + 2) & 0xff) << 16
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 2 =>
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 1 =>
        k ^= bytes(i) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  /** Spec: ints/longs/dates/times/timestamps all hash as the 8-byte
    * LITTLE-ENDIAN long (ints upcast — so hash(34) == hash(34L)). */
  def hashLong(v: Long): Int = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    murmur3(b)
  }

  /** Spec: strings hash their UTF-8 bytes (no length prefix). */
  def hashString(s: String): Int = murmur3(s.getBytes("UTF-8"))

  def bucketOfLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n
  def bucketOfString(s: String, n: Int): Int = (hashString(s) & Int.MaxValue) % n

  // ─────────────────────── transform evaluation ───────────────────────

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  /** Epoch-day ordinal of a source value: DateType values are already
    * days; timestamp values are epoch micros. */
  private def toEpochDay(dt: DataType, v: Long): Long = dt match {
    case DateType => v
    case _ => floorDiv(v, MicrosPerDay)
  }

  private def localDate(dt: DataType, v: Long): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(toEpochDay(dt, v))

  /** Evaluate a transform on a NORMALIZED source value — temporal
    * sources as Long (micros for timestamps, epoch days for dates),
    * integrals as Long, strings as String. Returns the Iceberg
    * partition value (Int for temporal + bucket, Long/String for
    * truncate, the input for identity); None when the transform cannot
    * apply to the type. */
  def eval(transform: String, dt: DataType, v: Any): Option[Any] =
    (transform, v) match {
      case ("identity", x) => Some(x)
      case ("day", x: Long) => Some(toEpochDay(dt, x).toInt)
      case ("hour", x: Long) => Some(floorDiv(x, MicrosPerHour).toInt)
      case ("month", x: Long) =>
        val d = localDate(dt, x)
        Some((d.getYear - 1970) * 12 + (d.getMonthValue - 1))
      case ("year", x: Long) => Some(localDate(dt, x).getYear - 1970)
      case (BucketRe(n), x: Long) => Some(bucketOfLong(x, n.toInt))
      case (BucketRe(n), x: String) => Some(bucketOfString(x, n.toInt))
      case (TruncateRe(w), x: Long) =>
        val width = w.toLong
        val t = x - Math.floorMod(x, width)
        Some(if (dt == IntegerType) t.toInt else t)
      case (TruncateRe(w), x: String) =>
        // spec: truncate to W CODE POINTS (safe for BMP + surrogates
        // via offsetByCodePoints)
        val width = w.toInt
        val cpCount = x.codePointCount(0, x.length)
        Some(if (cpCount <= width) x
             else x.substring(0, x.offsetByCodePoints(0, width)))
      case _ => None
    }

  /** The partition value's type for bound decoding: temporal + bucket
    * summarise as 4-byte ints; truncate keeps the source type;
    * identity is the source. None for unknown transforms. */
  def resultType(transform: String, src: DataType): Option[DataType] =
    transform match {
      case "identity" => Some(src)
      case "day" | "hour" | "month" | "year" => Some(IntegerType)
      case BucketRe(_) => Some(IntegerType)
      case TruncateRe(_) => Some(src)
      case _ => None
    }

  /** Map a SOURCE-value range [qlo,qhi] (doubles: epoch micros for
    * timestamps, epoch days for dates, numeric value otherwise) into
    * the transform's partition-value range for summary overlap checks.
    * Monotone transforms map the endpoints; `bucket` maps only POINT
    * ranges (qlo == qhi on an integral value); order-destroying or
    * inapplicable cases return None (no pruning without evidence). */
  def mapRange(transform: String, dt: DataType,
               qlo: Double, qhi: Double): Option[(Double, Double)] = {
    def monotone(f: Long => Long): Option[(Double, Double)] =
      // endpoints must be integral-exact for the floor math to be
      // sound (they are: micros/days/ids); tolerate fractional query
      // bounds by WIDENING (floor the lo, ceil the hi)
      Some((f(Math.floor(qlo).toLong).toDouble, f(Math.ceil(qhi).toLong).toDouble))
    transform match {
      case "identity" => Some((qlo, qhi))
      case "day" => monotone(v => toEpochDay(dt, v))
      case "hour" => monotone(v => floorDiv(v, MicrosPerHour))
      case "month" => monotone { v =>
        val d = localDate(dt, v)
        (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
      }
      case "year" => monotone(v => (localDate(dt, v).getYear - 1970).toLong)
      case TruncateRe(w) if dt == IntegerType || dt == LongType =>
        val width = w.toLong
        monotone(v => v - Math.floorMod(v, width))
      case BucketRe(n) if qlo == qhi && qlo == Math.rint(qlo) &&
          (dt == IntegerType || dt == LongType || dt == DateType ||
           dt == TimestampType || dt == TimestampNTZType) =>
        val b = bucketOfLong(qlo.toLong, n.toInt).toDouble
        Some((b, b))
      case _ => None
    }
  }

  /** Map a STRING-equality literal into (partition value bytes) for
    * summary bound checks: identity keeps the UTF-8 bytes,
    * `truncate[W]` truncates them, `bucket[N]` yields the bucket
    * ordinal as an Int (returned Left); None = no pruning. */
  def mapStringEq(transform: String, v: String): Option[Either[Int, Array[Byte]]] =
    transform match {
      case "identity" => Some(Right(v.getBytes("UTF-8")))
      case TruncateRe(w) =>
        eval(transform, StringType, v).map {
          case s: String => Right(s.getBytes("UTF-8"))
        }
      case BucketRe(n) => Some(Left(bucketOfString(v, n.toInt)))
      case _ => None
    }
}
