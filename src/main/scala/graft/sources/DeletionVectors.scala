package graft.sources

import java.util.zip.CRC32

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Delta Lake DELETION VECTORS — the reader half of the protocol
  * feature every modern Delta DML writer emits (delta.io PROTOCOL.md
  * "Deletion Vectors"; the bitmap payload is the PUBLIC 64-bit
  * RoaringBitmap "portable" serialization,
  * github.com/RoaringBitmap/RoaringFormatSpec): a data file's deleted
  * row indexes ride a compressed bitmap in the add action instead of
  * a file rewrite.
  *
  * Formats implemented, pinned to the published layouts and REFUSED
  * LOUDLY on any structural mismatch (magic, version byte, checksum,
  * size, cardinality, container cookie) — this reader was built
  * against hand-authored byte-level conformance vectors from the
  * specs (no Delta writer ships in this environment), so anything it
  * cannot prove it understands is an error, never a guess:
  *
  *  - DESCRIPTOR (`deletionVector` on add/remove): storageType
  *    `u` (relative file, path = `<prefix><z85 UUID>` under the table
  *    root, file `deletion_vector_<uuid>.bin`), `i` (inline, payload
  *    z85-encoded in the action itself), `p` (absolute path).
  *  - DV FILE: 1 version byte (= 1), then per stored vector —
  *    4-byte big-endian dataSize, dataSize payload bytes, 4-byte
  *    big-endian CRC-32 of the payload; the descriptor `offset`
  *    addresses the dataSize field.
  *  - PAYLOAD: 4-byte little-endian magic 1681511377, then the
  *    64-bit roaring portable form — 8-byte little-endian bucket
  *    count, per bucket a 4-byte little-endian high key and a
  *    standard 32-bit roaring bitmap (array / bitset / run
  *    containers, RoaringFormatSpec cookies 12346/12347).
  *  - Z85 (ZeroMQ spec 32): 5 chars per 4 bytes.
  *
  * Scale: a DV is kilobytes-to-megabytes per data file; decode is
  * O(deleted rows) and runs where the caller places it (the Delta
  * reader decodes per-file on executors via mapPartitions, so a
  * 100 TB table's vectors never funnel through the driver).
  */
object DeletionVectors {

  /** Parsed `deletionVector` descriptor from an add action. */
  case class DvDescriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Int, cardinality: Long)

  // ---- Z85 ------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"

  private val z85Values: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Decode a Z85 string (length must be a multiple of 5) to bytes. */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85 string length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) z85Values(c.toInt) else -1
        require(v >= 0, s"invalid z85 character '$c'")
        acc = acc * 85 + v
        j += 1
      }
      out(o) = ((acc >>> 24) & 0xff).toByte
      out(o + 1) = ((acc >>> 16) & 0xff).toByte
      out(o + 2) = ((acc >>> 8) & 0xff).toByte
      out(o + 3) = (acc & 0xff).toByte
      i += 5
      o += 4
    }
    out
  }

  // ---- roaring decode ---------------------------------------------------

  private val Magic = 1681511377

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def u64le(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
    v
  }

  /** Decode ONE standard 32-bit roaring bitmap starting at `pos`;
    * appends values (offset by `base`) to `out`, returns the position
    * after the bitmap.
    */
  private def decode32(b: Array[Byte], pos: Int, base: Long,
      out: scala.collection.mutable.ArrayBuffer[Long]): Int = {
    val cookie = u32le(b, pos)
    val SerialCookieNoRun = 12346L
    val SerialCookie = 12347L
    var p = pos
    val (nContainers, runFlags) =
      if ((cookie & 0xffffL) == SerialCookie) {
        val n = ((cookie >>> 16) & 0xffffL).toInt + 1
        p += 4
        val flagBytes = (n + 7) / 8
        val flags = (0 until n).map { i =>
          (b(p + i / 8) & (1 << (i % 8))) != 0 }.toArray
        p += flagBytes
        (n, flags)
      } else if (cookie == SerialCookieNoRun) {
        p += 4
        val n = u32le(b, p).toInt
        p += 4
        (n, Array.fill(n)(false))
      } else throw new IllegalArgumentException(
        s"unknown roaring cookie $cookie — refusing to guess")
    // descriptive headers: (key, cardinality-1) per container
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = u16(b, p); cards(i) = u16(b, p + 2) + 1
      p += 4; i += 1
    }
    // offset header: present without runs always; with runs only when
    // the container count reaches the spec's NO_OFFSET_THRESHOLD (4)
    val hasRuns = (cookie & 0xffffL) == SerialCookie
    if (!hasRuns || nContainers >= 4) p += 4 * nContainers
    i = 0
    while (i < nContainers) {
      val hi = base + ((keys(i).toLong) << 16)
      if (runFlags(i)) {
        val nRuns = u16(b, p); p += 2
        var r = 0
        while (r < nRuns) {
          val start = u16(b, p); val len = u16(b, p + 2)
          p += 4
          var v = 0
          while (v <= len) { out += hi + start + v; v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitset container: 8 KiB, 65536 bits little-endian words
        var w = 0
        var n = 0
        while (w < 8192) {
          val byte = b(p + w) & 0xff
          if (byte != 0) {
            var bit = 0
            while (bit < 8) {
              if ((byte & (1 << bit)) != 0) { out += hi + w * 8 + bit; n += 1 }
              bit += 1
            }
          }
          w += 1
        }
        require(n == cards(i),
          s"bitset container cardinality $n != header ${cards(i)}")
        p += 8192
      } else {
        var v = 0
        while (v < cards(i)) { out += hi + u16(b, p); p += 2; v += 1 }
      }
      i += 1
    }
    p
  }

  /** Decode a Delta DV PAYLOAD (magic + 64-bit roaring portable) to
    * the sorted deleted row indexes.
    */
  def decodePayload(data: Array[Byte]): Array[Long] = {
    require(data.length >= 12,
      s"deletion vector payload of ${data.length} bytes is too short")
    val magic = u32le(data, 0)
    require(magic == Magic,
      s"deletion vector magic $magic != $Magic — refusing to guess")
    val nBitmaps = u64le(data, 4)
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"implausible bucket count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var p = 12
    var i = 0L
    while (i < nBitmaps) {
      val key = u32le(data, p)
      p += 4
      p = decode32(data, p, key << 32, out)
      i += 1
    }
    require(p == data.length,
      s"deletion vector payload has $p decoded bytes of ${data.length}")
    out.sorted.toArray
  }

  /** Read + verify one stored vector from a DV FILE's bytes at
    * `offset` (the 4-byte big-endian dataSize field), per the
    * protocol's file layout. CRC-32 and size mismatches refuse.
    */
  def decodeAt(file: Array[Byte], offset: Long, sizeInBytes: Int)
      : Array[Long] = {
    require(file.nonEmpty && file(0) == 1,
      s"deletion vector file version ${if (file.isEmpty) "<empty>"
        else file(0)} is not 1 — refusing to guess")
    val p = offset.toInt
    require(p >= 1 && p + 4 <= file.length, s"offset $offset out of file")
    val dataSize = ((file(p) & 0xff) << 24) | ((file(p + 1) & 0xff) << 16) |
      ((file(p + 2) & 0xff) << 8) | (file(p + 3) & 0xff)
    require(dataSize == sizeInBytes,
      s"stored dataSize $dataSize != descriptor sizeInBytes $sizeInBytes")
    require(p + 4 + dataSize + 4 <= file.length,
      "deletion vector runs past end of file")
    val data = java.util.Arrays.copyOfRange(file, p + 4, p + 4 + dataSize)
    val crc = new CRC32()
    crc.update(data)
    val stored =
      ((file(p + 4 + dataSize) & 0xffL) << 24) |
        ((file(p + 5 + dataSize) & 0xffL) << 16) |
        ((file(p + 6 + dataSize) & 0xffL) << 8) |
        (file(p + 7 + dataSize) & 0xffL)
    require(stored == crc.getValue,
      s"deletion vector checksum $stored != computed ${crc.getValue}")
    decodePayload(data)
  }

  /** Resolve a descriptor against the table root: (absolute DV file
    * path, or None for inline). storageType 'u' decodes the z85 UUID
    * suffix (prefix chars, if any, are a directory level).
    */
  def resolveFile(tableDir: String, d: DvDescriptor): Option[Path] =
    d.storageType match {
      case "i" => None
      case "p" => Some(new Path(d.pathOrInlineDv))
      case "u" =>
        require(d.pathOrInlineDv.length >= 20,
          s"storageType u path '${d.pathOrInlineDv}' shorter than a " +
            "z85 uuid")
        val prefix = d.pathOrInlineDv.dropRight(20)
        val bytes = z85Decode(d.pathOrInlineDv.takeRight(20))
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val uuid = new java.util.UUID(bb.getLong, bb.getLong)
        val name = s"deletion_vector_$uuid.bin"
        Some(if (prefix.isEmpty) new Path(tableDir, name)
        else new Path(new Path(tableDir, prefix), name))
      case other => throw new UnsupportedOperationException(
        s"deletion vector storageType '$other' is not implemented " +
          "(u, i, p are) — refusing to guess")
    }

  /** Decode a descriptor to its deleted row indexes: inline payloads
    * decode in place; file-backed vectors read through the given
    * Hadoop configuration (callable on executors — the conf travels
    * as a serializable property map).
    */
  def deletedRows(tableDir: String, d: DvDescriptor,
      conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    val rows = resolveFile(tableDir, d) match {
      case None =>
        val raw = z85Decode(d.pathOrInlineDv)
        require(raw.length >= d.sizeInBytes,
          s"inline deletion vector decodes to ${raw.length} bytes < " +
            s"sizeInBytes ${d.sizeInBytes}")
        decodePayload(java.util.Arrays.copyOf(raw, d.sizeInBytes))
      case Some(path) =>
        val fs = path.getFileSystem(conf)
        val st = fs.getFileStatus(path)
        require(st.getLen <= 64L * 1024 * 1024,
          s"deletion vector file ${st.getLen} bytes exceeds the 64 MiB " +
            "single-read bound")
        val in = fs.open(path)
        val bytes =
          try org.apache.commons.io.IOUtils.toByteArray(in)
          finally in.close()
        decodeAt(bytes, d.offset.getOrElse(
          throw new IllegalArgumentException(
            "file-backed deletion vector descriptor lacks offset")),
          d.sizeInBytes)
    }
    require(rows.length == d.cardinality,
      s"deletion vector decoded ${rows.length} rows != descriptor " +
        s"cardinality ${d.cardinality}")
    rows
  }

  // ---- fixture-side encoder (tests + hand-built tables only) ----------

  /** Z85-encode bytes (length must be a multiple of 4). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 input length ${bytes.length} is not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val block = new Array[Char](5)
      var k = 4
      while (k >= 0) {
        block(k) = Z85Alphabet((acc % 85).toInt); acc /= 85; k -= 1
      }
      sb.appendAll(block)
      i += 4
    }
    sb.toString
  }

  /** Encode row indexes as a DV payload (magic + 64-bit roaring
    * portable, ARRAY containers only — the fixture builder; real
    * writers' bitset/run containers are covered by the decoder's
    * conformance vectors).
    */
  def encodePayload(rows: Seq[Long]): Array[Byte] = {
    require(rows.forall(_ >= 0), "row indexes must be >= 0")
    val buckets = rows.distinct.sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => bos.write(((v >>> (8 * i)) & 0xff).toInt))
    def le64(v: Long): Unit =
      (0 until 8).foreach(i => bos.write(((v >>> (8 * i)) & 0xff).toInt))
    le32(Magic)
    le64(buckets.size.toLong)
    buckets.foreach { case (hi, vs) =>
      le32(hi)
      val containers = vs.map(v => v & 0xffffffffL)
        .groupBy(_ >>> 16).toSeq.sortBy(_._1)
      require(containers.forall(_._2.size <= 4096),
        "fixture encoder emits array containers only (<= 4096 values " +
          "per 2^16 chunk)")
      le32(12346L) // SERIAL_COOKIE_NO_RUNCONTAINER
      le32(containers.size.toLong)
      containers.foreach { case (k, cv) =>
        bos.write((k & 0xff).toInt); bos.write(((k >>> 8) & 0xff).toInt)
        val c = cv.size - 1
        bos.write(c & 0xff); bos.write((c >>> 8) & 0xff)
      }
      // offset header (no-run cookie => always present)
      var off = 4 + 4 + 4 * containers.size + 4 * containers.size
      containers.foreach { case (_, cv) =>
        le32(off.toLong); off += 2 * cv.size
      }
      containers.foreach { case (_, cv) =>
        cv.sorted.foreach { v =>
          val lo = (v & 0xffffL).toInt
          bos.write(lo & 0xff); bos.write((lo >>> 8) & 0xff)
        }
      }
    }
    bos.toByteArray
  }

  /** Write a single-vector DV FILE (version byte, size, payload,
    * CRC-32); returns the descriptor offset (always 1).
    */
  def writeDvFile(spark: SparkSession, path: Path,
      payload: Array[Byte]): Long = {
    val fs = graft.streaming.CdcApply.fsFor(spark, path.toString)
    val out = fs.create(path, true)
    out.write(1) // version
    out.write(Array[Byte](
      ((payload.length >>> 24) & 0xff).toByte,
      ((payload.length >>> 16) & 0xff).toByte,
      ((payload.length >>> 8) & 0xff).toByte,
      (payload.length & 0xff).toByte))
    out.write(payload)
    val crc = new CRC32()
    crc.update(payload)
    val c = crc.getValue
    out.write(Array[Byte](((c >>> 24) & 0xff).toByte,
      ((c >>> 16) & 0xff).toByte, ((c >>> 8) & 0xff).toByte,
      (c & 0xff).toByte))
    out.close()
    1L
  }
}
