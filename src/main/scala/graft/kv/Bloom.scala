package graft.kv

import org.apache.spark.sql.expressions.Aggregator

/** Per-file rowkey Bloom filter riding the snapshot range manifest —
  * the HBase StoreFile BloomFilter (BloomType.ROW) analog: an HBase
  * Get consults the HFile's bloom BEFORE touching its block index, so
  * a miss costs zero data I/O; here a driver-side point Get consults
  * the manifest's per-file bloom BEFORE the parquet footer read, so a
  * key that falls inside a file's [lo,hi] range but was never written
  * skips the file entirely (DriverRead.bloomSkipCount pins it).
  *
  * Construction is DISTRIBUTIVE and rides the same one-pass columnar
  * scan that derives the range manifest (Catalog.scanRanges): rows are
  * pre-hashed with Spark's own `xxhash64(keyCol)` (seed 42), and the
  * aggregator folds the k bit positions per file — merge is a bitwise
  * OR, so any partitioning works. The DRIVER recomputes the identical
  * base hash through Catalyst's XxHash64Function (same object the
  * expression evaluates), and both sides derive the k positions from
  * one base hash via the Kirsch–Mitzenmacher double-hash recipe with a
  * splitmix64-finalizer second hash — ONE cross-engine hash to keep in
  * agreement, everything after it is shared code in this object.
  *
  * Sizing: `mBits` is a per-file constant (conf
  * `spark.graft.manifest.bloomBits`, default 2^17 = 16 KiB per file,
  * k = 7). At the 128 MB/~1M-row file the scale design assumes, 16 KiB
  * is ~0.13 bits/key — production sizes the knob up (10 bits/key ⇒
  * ~1% false positives) or moves the bitsets to a per-file sidecar
  * like HFile does; the manifest JSON carries base64, so the format
  * already supports either. A false positive only costs the footer
  * read the bloom tried to save — never correctness. */
private[kv] object BloomBits {
  val Hashes = 7

  /** splitmix64 finalizer — the second hash of the double-hash scheme,
    * a pure function of the base hash so only ONE cross-engine hash
    * (Spark's xxhash64) must agree between build and probe. */
  private def mix(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The k bit positions of one pre-hashed key in an m-bit filter. */
  def positions(baseHash: Long, mBits: Int): Array[Int] = {
    val h2 = mix(baseHash)
    val out = new Array[Int](Hashes)
    var i = 0
    while (i < Hashes) {
      val combined = baseHash + i.toLong * h2
      out(i) = ((combined & Long.MaxValue) % mBits).toInt
      i += 1
    }
    out
  }

  def set(bits: Array[Byte], baseHash: Long): Unit = {
    val m = bits.length * 8
    positions(baseHash, m).foreach { p =>
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
    }
  }

  def mightContain(bits: Array[Byte], baseHash: Long): Boolean = {
    val m = bits.length * 8
    positions(baseHash, m).forall { p =>
      (bits(p >>> 3) & (1 << (p & 7))) != 0
    }
  }
}

/** Bitset-OR aggregator over pre-hashed keys (input = `xxhash64(key)`
  * column values), one filter per group — used per part-file by the
  * manifest scan. Buffers are byte arrays of mBits/8; merge ORs. */
private[kv] class BloomAgg(mBits: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(mBits >= 8 && (mBits & 7) == 0, s"mBits must be a multiple of 8: $mBits")
  override def zero: Array[Byte] = new Array[Byte](mBits / 8)
  override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
    BloomBits.set(b, h); b
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
