package graft.index

import scala.collection.mutable.ArrayBuffer

/** Posting-list compression: delta-encoded docIDs in VByte blocks of 128
  * with per-block skip/block-max metadata — the from-scratch rebuild of the
  * posting layer the reference delegates to Lucene's codec (SURVEY.md §2.5,
  * [Lucene public semantics]; block-max metadata per Ding & Suel 2011 for
  * WAND pruning, which the north rule mandates).
  *
  * Per block:
  *  - `firstDoc`/`lastDoc`: skip bounds for `advance(target)`
  *  - `maxTf`, `maxTfNorm`: block-max score bound. `maxTfNorm` is the BM25
  *    tf-normalization part `tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))` maximized
  *    over the block's docs — multiply by a term's idf to get the exact
  *    block score upper bound (avgdl is fixed at encode time from field
  *    stats).
  *  - docIDs delta-VByte; tf and dl VByte; positions delta-VByte per doc
  *    (tf of them), enabling phrase queries.
  */
object Codec {

  val BlockSize = 128

  /** `encAvgdl` is the field avgdl the block-max bound was computed against.
    * When the live index's merged avgdl q differs (incremental appends), the
    * true tf-norm under q is bounded by `maxTfNorm · max(1, q/encAvgdl)`
    * (the avgdl only enters the BM25 denominator as C1 + C2/avgdl with
    * C1, C2 ≥ 0, so the ratio of norms is ≤ q/encAvgdl when q > encAvgdl) —
    * scorers apply that inflation so WAND stays sound across generations.
    *
    * `minPos`/`maxPos` bound every token position stored in the block —
    * per-block PHRASE metadata (COVERAGE round-4 item): a phrase scorer
    * intersects its member terms' current-block position ranges and skips
    * the whole block overlap (never decoding positions) when the ranges
    * can't form a window within the slop.
    */
  final case class Block(
      firstDoc: Long,
      lastDoc: Long,
      count: Int,
      maxTf: Int,
      maxTfNorm: Double,
      encAvgdl: Double,
      minPos: Int,
      maxPos: Int,
      docBytes: Array[Byte],
      tfBytes: Array[Byte],
      dlBytes: Array[Byte],
      posBytes: Array[Byte])

  /** One decoded posting. */
  final case class Decoded(docId: Long, tf: Int, dl: Int, positions: Array[Int])

  /** Growable raw byte buffer — the encode path is allocation-hot (billions
    * of postings at scale); `ArrayBuffer[Byte]` would box every byte.
    */
  final class ByteWriter(initial: Int = 64) {
    private var buf = new Array[Byte](initial)
    private var len = 0
    def append(b: Byte): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = b
      len += 1
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    def size: Int = len
  }

  // ---- VByte ----------------------------------------------------------
  def writeVLong(out: ByteWriter, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"vlong must be non-negative: $v")
    while ((v & ~0x7fL) != 0) {
      out.append(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    out.append(v.toByte)
  }

  /** Reads a VLong from `bytes` at `pos`; returns (value, newPos). */
  def readVLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var v = 0L
    var b = bytes(p)
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
      b = bytes(p)
    }
    v |= (b & 0x7fL) << shift
    (v, p + 1)
  }

  // ---- encode ----------------------------------------------------------
  /** Encode one docId-sorted posting run into blocks. `avgdl` fixes the
    * block-max tf-norm bound.
    */
  def encode(run: Iterator[Decoded], avgdl: Double): Vector[Block] = {
    val blocks = Vector.newBuilder[Block]
    val buf = new ArrayBuffer[Decoded](BlockSize)
    def flush(): Unit = {
      if (buf.nonEmpty) {
        val docB = new ByteWriter()
        val tfB = new ByteWriter()
        val dlB = new ByteWriter()
        val posB = new ByteWriter()
        var prev = buf.head.docId
        writeVLong(docB, prev) // first docId absolute
        var maxTf = 0
        var maxNorm = 0.0
        var minPos = Int.MaxValue
        var maxPos = -1
        buf.foreach { d =>
          if (d.docId != buf.head.docId) {
            writeVLong(docB, d.docId - prev)
            prev = d.docId
          }
          writeVLong(tfB, d.tf.toLong)
          writeVLong(dlB, d.dl.toLong)
          var pPrev = 0
          d.positions.foreach { p =>
            writeVLong(posB, (p - pPrev).toLong)
            pPrev = p
          }
          if (d.positions.nonEmpty) {
            if (d.positions(0) < minPos) minPos = d.positions(0)
            if (d.positions(d.positions.length - 1) > maxPos) maxPos = d.positions(d.positions.length - 1)
          }
          if (d.tf > maxTf) maxTf = d.tf
          val norm = d.tf * (IndexBuilder.K1 + 1.0) /
            (d.tf + IndexBuilder.K1 * ((1.0 - IndexBuilder.B) + (IndexBuilder.B / avgdl) * d.dl))
          if (norm > maxNorm) maxNorm = norm
        }
        if (minPos == Int.MaxValue) minPos = 0 // no positions stored anywhere in the block
        if (maxPos < 0) maxPos = Int.MaxValue - 1
        blocks += Block(buf.head.docId, buf.last.docId, buf.length, maxTf, maxNorm, avgdl,
          minPos, maxPos, docB.toArray, tfB.toArray, dlB.toArray, posB.toArray)
        buf.clear()
      }
    }
    run.foreach { d =>
      buf += d
      if (buf.length == BlockSize) flush()
    }
    flush()
    blocks.result()
  }

  // ---- decode ----------------------------------------------------------

  /** Doc-level view of a block: docIds/tf/dl WITHOUT positions. Positions
    * are the bulk of a positional index's bytes, and term/boolean scoring
    * never reads them — [[Scorers.TermIterator]] decodes docs eagerly and
    * positions only on a phrase scorer's first request for the block.
    */
  final class BlockDocs(val docIds: Array[Long], val tfs: Array[Int], val dls: Array[Int])

  def decodeDocs(b: Block): BlockDocs = {
    val docIds = new Array[Long](b.count)
    val tfs = new Array[Int](b.count)
    val dls = new Array[Int](b.count)
    var docPos = 0
    var tfPos = 0
    var dlPos = 0
    var doc = 0L
    var i = 0
    while (i < b.count) {
      val (delta, np) = readVLong(b.docBytes, docPos)
      docPos = np
      doc = if (i == 0) delta else doc + delta
      docIds(i) = doc
      val (tf, ntf) = readVLong(b.tfBytes, tfPos)
      tfPos = ntf
      tfs(i) = tf.toInt
      val (dl, ndl) = readVLong(b.dlBytes, dlPos)
      dlPos = ndl
      dls(i) = dl.toInt
      i += 1
    }
    new BlockDocs(docIds, tfs, dls)
  }

  /** Decode the whole block's position lists (tf(i) positions per doc). */
  def decodePositions(b: Block, tfs: Array[Int]): Array[Array[Int]] = {
    val out = new Array[Array[Int]](b.count)
    var posPos = 0
    var i = 0
    while (i < b.count) {
      val tf = tfs(i)
      val positions = new Array[Int](tf)
      var p = 0
      var j = 0
      while (j < tf) {
        val (d, npp) = readVLong(b.posBytes, posPos)
        posPos = npp
        p += d.toInt
        positions(j) = p
        j += 1
      }
      out(i) = positions
      i += 1
    }
    out
  }

  def decode(b: Block): Array[Decoded] = {
    val out = new Array[Decoded](b.count)
    var docPos = 0
    var tfPos = 0
    var dlPos = 0
    var posPos = 0
    var doc = 0L
    var i = 0
    while (i < b.count) {
      val (delta, np) = readVLong(b.docBytes, docPos)
      docPos = np
      doc = if (i == 0) delta else doc + delta
      val (tf, ntf) = readVLong(b.tfBytes, tfPos)
      tfPos = ntf
      val (dl, ndl) = readVLong(b.dlBytes, dlPos)
      dlPos = ndl
      val positions = new Array[Int](tf.toInt)
      var p = 0
      var j = 0
      while (j < tf.toInt) {
        val (d, npp) = readVLong(b.posBytes, posPos)
        posPos = npp
        p += d.toInt
        positions(j) = p
        j += 1
      }
      out(i) = Decoded(doc, tf.toInt, dl.toInt, positions)
      i += 1
    }
    out
  }
}
