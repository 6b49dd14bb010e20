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
  * Sizing is PER-KEY, like HBase's io.storefile.bloom sizing: the
  * aggregation builds every file's filter at a power-of-two cap
  * (conf `spark.graft.manifest.bloomMaxBits`, default 2^23) and the
  * aggregator's `finish` folds each file's bitset down EXECUTOR-SIDE
  * ([[BloomBits.foldTo]] — lossless for the double-hash positions) to
  * the smallest power of two ≥ rows × bits-per-key (conf
  * `spark.graft.manifest.bloomBitsPerKey`, default 10 ⇒ ~1% FPR with
  * k = 7), so the gate corpus and a 100-TB corpus get the same
  * false-positive rate, and the aggregation OUTPUT (the shuffle to
  * the final agg and the driver collect) carries only the folded
  * filter — never the 1 MiB cap per file; at the cap (≥ ~800k
  * rows/file) the FPR degrades gracefully instead of the filter
  * growing unboundedly. Setting the legacy flat knob
  * `spark.graft.manifest.bloomBits` overrides all of this with a
  * fixed per-file size.
  *
  * Persistence: small tables inline the bitsets as base64 in the
  * manifest JSON; past `spark.graft.manifest.bloomSidecarBytes`
  * (default 256 KiB) of total filter bytes they spill to a
  * CONTENT-ADDRESSED binary sidecar beside the manifest
  * (`_graft_blooms_<crc>.bin` — HFile's bloom-block shape), which the
  * manifest references by exact name, so the atomic manifest rename
  * always pairs with the sidecar it was written against; range-scan
  * readers that never probe blooms keep parsing a small JSON. A false
  * positive only costs the footer read the bloom tried to save —
  * never correctness. */
private[graft] object BloomBits {
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

  /** Fold a POWER-OF-TWO-sized filter down to `targetBits` (also a
    * power of two): position p in the large filter maps to
    * p mod targetBits — byte-wise, out[i mod outLen] |= in[i]. The
    * membership law is preserved exactly because the position recipe
    * reduces the (non-negative) combined hash mod m, and
    * (h mod 2^a) mod 2^b = h mod 2^b for b ≤ a — so a probe against
    * the folded filter (whose m comes from its array length) agrees
    * with building at the small size directly. This is what lets ONE
    * aggregation pass build every file's filter at the size cap and
    * size each file's PERSISTED filter from its own row count
    * afterwards (bits-per-key sizing, scale-invariant FPR). */
  def foldTo(bits: Array[Byte], targetBits: Int): Array[Byte] = {
    require(targetBits >= 8 && Integer.bitCount(targetBits) == 1,
      s"target bloom size must be a power of two >= 8 bits: $targetBits")
    val outLen = targetBits / 8
    if (bits.length <= outLen) return bits
    require(bits.length % outLen == 0,
      s"can only fold power-of-two sizes: ${bits.length * 8} -> $targetBits")
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < bits.length) {
      out(i % outLen) = (out(i % outLen) | bits(i)).toByte
      i += 1
    }
    out
  }

  /** Smallest power of two ≥ x (x ≥ 1). */
  def nextPow2(x: Long): Long =
    if (x <= 1L) 1L else java.lang.Long.highestOneBit(x - 1L) << 1
}

/** Bitset-OR aggregator over pre-hashed keys (input = `xxhash64(key)`
  * column values), one filter per group — used per part-file by the
  * manifest scan. Buffers carry (rowCount, bits of mBits/8); merge
  * sums counts and ORs bits. With `foldBitsPerKey` set (per-key
  * sizing, the default path), `finish` folds the cap-sized bitset
  * down to nextPow2(rows × bitsPerKey) EXECUTOR-SIDE — the final
  * aggregation output, shuffle-to-driver transfer and the manifest
  * collect carry the small folded filter, never the 1 MiB cap, at
  * any file count. None (the legacy flat knob) emits the raw bits. */
private[kv] class BloomAgg(mBits: Int, foldBitsPerKey: Option[Int] = None)
    extends Aggregator[Long, (Long, Array[Byte]), Array[Byte]] {
  require(mBits >= 8 && (mBits & 7) == 0, s"mBits must be a multiple of 8: $mBits")
  override def zero: (Long, Array[Byte]) = (0L, new Array[Byte](mBits / 8))
  override def reduce(b: (Long, Array[Byte]), h: Long): (Long, Array[Byte]) = {
    BloomBits.set(b._2, h); (b._1 + 1, b._2)
  }
  override def merge(a: (Long, Array[Byte]),
                     b: (Long, Array[Byte])): (Long, Array[Byte]) = {
    var i = 0
    while (i < a._2.length) { a._2(i) = (a._2(i) | b._2(i)).toByte; i += 1 }
    (a._1 + b._1, a._2)
  }
  override def finish(r: (Long, Array[Byte])): Array[Byte] =
    foldBitsPerKey match {
      case Some(bpk) =>
        val target = math.min(mBits.toLong,
          math.max(1L << 10, BloomBits.nextPow2(r._1 * bpk)))
        BloomBits.foldTo(r._2, target.toInt)
      case None => r._2
    }
  override def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Array[Byte])] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.BINARY)
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
