package graft.sources.fits

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.fits.core._

/** Executor-side reader of one row-aligned byte slice.
  *
  * Reads the slice in large buffered chunks (default 4 MB, row-aligned;
  * `recordlength` overrides) and decodes straight to `InternalRow`.
  * Scalar/string bintables take a zero-per-row-allocation path through
  * a reused `UnsafeRowWriter` — per-row boxing otherwise caps the
  * 32-thread scan at the allocator, not the CPU (measured 6× slower).
  * Array columns (vector TFORMs, images) fall back to boxed rows.
  * Because partitions were planned row-aligned on the driver, there is
  * no split-rejection or rewind logic here at all (cf. the reference's
  * FitsRecordReader.scala:199-263).
  */
final class FitsPartitionReader(part: FitsInputPartition,
    conf: Configuration = new Configuration())
    extends PartitionReader[InternalRow] {

  private val path = new Path(part.file)
  private val in = path.getFileSystem(conf).open(path)

  private val rowBytes = part.rowBytes
  private val rowsPerChunk: Int = {
    val byBuffer = math.max(1L, part.bufferBytes.toLong / rowBytes)
    math.min(byBuffer, part.numRows).toInt
  }
  private val buf = new Array[Byte](rowsPerChunk * rowBytes)

  private var chunkRows = 0 // valid rows currently in buf
  private var rowInChunk = 0 // next row to emit, relative to chunk
  private var emitted = 0L // rows emitted so far

  // ---------------------------------------------------------- fast path

  private val bintableCols: Array[BintableColumn] = part.spec match {
    case DecodeSpec.Bintable(cols, _) => cols
    case _ => null
  }

  /** Absolute file offset of the variable-length heap (−1 ⇒ no P/Q
    * column in this projection). */
  private val heapStart: Long = part.spec match {
    case DecodeSpec.Bintable(_, h) => h
    case DecodeSpec.CompImage(m, _, _, _) => m.heapStart
    case _ => -1L
  }

  /** Unsafe path applies when every column is fixed-width scalar,
    * string, scaled-scalar, ASCII-text scalar, or unsupported-null —
    * no array output and no heap indirection. */
  private val useUnsafe: Boolean = bintableCols != null &&
    bintableCols.forall {
      _.tform match {
        case _: TForm.Scalar | _: TForm.Str | _: TForm.Unsupported |
             _: TForm.AsciiInt | _: TForm.AsciiReal => true
        case sc: TForm.Scaled => !sc.isArray
        case wn: TForm.WithNull => wn.inner.isInstanceOf[TForm.Scalar]
        case _ => false
      }
    }

  private val unsafeWriter: UnsafeRowWriter =
    if (useUnsafe) new UnsafeRowWriter(bintableCols.length) else null

  /** Boxed-path converters (arrays / images). */
  private val converters: Array[(Array[Byte], Int) => Any] =
    if (bintableCols != null && !useUnsafe) bintableCols.map(converterFor)
    else Array.empty

  private def converterFor(c: BintableColumn): (Array[Byte], Int) => Any = {
    val off = c.offset
    c.tform match {
      case TForm.Str(_, len) =>
        (b, base) => UTF8String.fromString(
          new String(b, base + off, len, "UTF-8").trim)
      case s: TForm.Scalar =>
        (b, base) => s.decode(b, base + off)
      case v: TForm.Vec =>
        (b, base) => new GenericArrayData(
          v.decode(b, base + off).asInstanceOf[Array[Any]])
      case x: TForm.Bits =>
        (b, base) => new GenericArrayData(
          x.decode(b, base + off).asInstanceOf[Array[Any]])
      case sc: TForm.Scaled if sc.isArray =>
        (b, base) => new GenericArrayData(
          sc.decode(b, base + off).asInstanceOf[Array[Any]])
      case sc: TForm.Scaled =>
        (b, base) => sc.decode(b, base + off)
      case a: TForm.AsciiInt =>
        (b, base) => a.decode(b, base + off)
      case a: TForm.AsciiReal =>
        (b, base) => a.decode(b, base + off)
      case m: TForm.Md =>
        // nested levels are already GenericArrayData (TForm.Md.nest);
        // only the outermost array needs the catalyst wrapper here
        (b, base) => new GenericArrayData(
          m.decode(b, base + off).asInstanceOf[Array[Any]])
      case wn: TForm.WithNull if wn.inner.isInstanceOf[TForm.Vec] =>
        (b, base) => new GenericArrayData(
          wn.decode(b, base + off).asInstanceOf[Array[Any]])
      case wn: TForm.WithNull =>
        (b, base) => wn.decode(b, base + off)
      case v: TForm.VarArr if v.degraded =>
        // heap truncated (see FitsStructure.degradeVarCols): NULL out
        (_, _) => null
      case v: TForm.VarArr =>
        // heap indirection: descriptor in the row, elements from the
        // heap. fill() coalesces each chunk's heap span into ONE
        // positioned read (rows written sequentially reference a
        // near-contiguous span); only scattered descriptors fall back
        // to a per-row pread — the difference between O(1) and O(rows)
        // round trips per chunk on an object store.
        (b, base) => {
          val (n0, hoff) = v.descriptor(b, base + off)
          // payload sized as Long first: a corrupt count on a column
          // with no declared (max) must fail loudly, not overflow Int
          if (n0 < 0 || n0 > v.maxLen ||
            n0 * v.elem.width > FitsPartitionReader.MaxVarElement)
            throw new IllegalArgumentException(
              s"corrupt variable-length descriptor in '${c.name}': " +
                s"count $n0 outside [0, ${v.maxLen}] or element over " +
                s"${FitsPartitionReader.MaxVarElement} bytes")
          val n = n0.toInt
          val payload = n * v.elem.width
          if (heapLen > 0 && hoff >= heapBase &&
            hoff + payload <= heapBase + heapLen)
            decodeVar(v, heapBuf, (hoff - heapBase).toInt, n)
          else {
            val bytes = new Array[Byte](payload)
            if (n > 0) in.readFully(heapStart + hoff, bytes, 0, payload)
            decodeVar(v, bytes, 0, n)
          }
        }
      case _: TForm.Unsupported =>
        (_, _) => null
    }
  }

  private def decodeVar(v: TForm.VarArr, src: Array[Byte], at: Int,
      n: Int): Any =
    if (v.isString)
      // The heap descriptor length is exact — unlike fixed nA fields
      // there is no blank padding, so trimming would corrupt documents
      // with meaningful leading/trailing whitespace. Copy out of the
      // (reused) coalesced heap buffer.
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(src, at, at + n))
    else {
      val out = new Array[Any](n)
      var j = 0
      while (j < n) { out(j) = v.elem.decode(src, at + j * v.elem.width); j += 1 }
      new GenericArrayData(out)
    }

  // var-length columns in this projection, for chunk heap coalescing
  // (tile-compressed images take the band path below, which preads per
  // payload — this fallback reader never coalesces their heap)
  private val varCols: Array[(Int, TForm.VarArr)] = part.spec match {
    case _: DecodeSpec.CompImage => Array.empty
    case _ if bintableCols == null => Array.empty
    case _ => bintableCols.collect {
      case col if col.tform.isInstanceOf[TForm.VarArr] &&
        !col.tform.asInstanceOf[TForm.VarArr].degraded =>
        (col.offset, col.tform.asInstanceOf[TForm.VarArr])
    }
  }
  /** Coalesced heap window for the current chunk (len 0 ⇒ fall back to
    * per-row preads). Cap keeps one pathological chunk from buffering
    * an arbitrarily large heap span. */
  private val MaxHeapSpan: Long = 64L << 20
  private var heapBuf: Array[Byte] = Array.emptyByteArray
  private var heapBase = 0L
  private var heapLen = 0L

  // true when this partition emits IMAGE LINES assembled from a cached
  // tile-row band rather than one row per table row
  private val isComp: Boolean = part.spec.isInstanceOf[DecodeSpec.CompImage]

  override def next(): Boolean = {
    if (emitted >= part.numRows) return false
    // the comp path reads per band inside get() — no chunk fill; an
    // empty projection (metadata-only select over a bintable) emits
    // numRows empty rows without touching the data bytes at all
    val noIo = bintableCols != null && bintableCols.isEmpty
    if (!isComp && !noIo && rowInChunk >= chunkRows) fill()
    true
  }

  private def fill(): Unit = {
    chunkRows = math.min(rowsPerChunk.toLong, part.numRows - emitted).toInt
    in.readFully(part.startByte + emitted * rowBytes, buf, 0,
      chunkRows * rowBytes)
    rowInChunk = 0
    heapLen = 0L
    if (varCols.nonEmpty && heapStart >= 0) {
      // one pass over the chunk's descriptors: the union heap span
      var lo = Long.MaxValue
      var hi = 0L
      var r = 0
      while (r < chunkRows) {
        val base = r * rowBytes
        var k = 0
        while (k < varCols.length) {
          val (off, v) = varCols(k)
          val (n, hoff) = v.descriptor(buf, base + off)
          if (n > 0 && n <= v.maxLen && hoff >= 0) {
            val end = hoff + n * v.elem.width
            if (hoff < lo) lo = hoff
            if (end > hi) hi = end
          }
          k += 1
        }
        r += 1
      }
      if (lo < hi && hi - lo <= MaxHeapSpan) {
        if (heapBuf.length < (hi - lo).toInt)
          heapBuf = new Array[Byte]((hi - lo).toInt)
        in.readFully(heapStart + lo, heapBuf, 0, (hi - lo).toInt)
        heapBase = lo
        heapLen = hi - lo
      }
    }
  }

  override def get(): InternalRow = {
    val base = rowInChunk * rowBytes
    val row: InternalRow =
      if (useUnsafe) writeUnsafe(base)
      else part.spec match {
        case DecodeSpec.Bintable(_, _) =>
          val values = new Array[Any](converters.length)
          var i = 0
          while (i < converters.length) {
            values(i) = converters(i)(buf, base)
            i += 1
          }
          new GenericInternalRow(values)
        case DecodeSpec.Image(elem, _, fieldKinds, colLo, colN, _) =>
          // this fallback reader always reads full lines; the pushed
          // column window applies at decode (the strided-IO variant
          // lives in the vectorized reader, which images normally take)
          val values = new Array[Any](fieldKinds.length)
          var i = 0
          while (i < fieldKinds.length) {
            values(i) =
              if (fieldKinds(i) == 0) {
                val arr = new Array[Any](colN)
                var j = 0
                while (j < colN) {
                  arr(j) = elem.decode(buf, base + (colLo + j) * elem.width)
                  j += 1
                }
                new GenericArrayData(arr)
              } else java.lang.Long.valueOf(part.firstRowIndex + emitted)
            i += 1
          }
          new GenericInternalRow(values)
        case DecodeSpec.CompImage(m, fieldKinds, colLo, colN) =>
          // one emitted row = one IMAGE LINE assembled from the cached
          // tile-row band (row tiling is the 1×width special case)
          val line = part.firstRowIndex + emitted
          val band = line / m.tileH
          if (band != compBand) loadCompBand(m, band)
          val rowInBand = (line - band * m.tileH).toInt
          val values = new Array[Any](fieldKinds.length)
          var i = 0
          while (i < fieldKinds.length) {
            values(i) =
              if (fieldKinds(i) == 0) assembleLine(m, rowInBand, colLo, colN)
              else java.lang.Long.valueOf(line)
            i += 1
          }
          new GenericInternalRow(values)
      }
    rowInChunk += 1
    emitted += 1
    row
  }

  // ------------------------------------------- tile-band cache (comp)

  private var compBand = -1L
  private var compTiles: Array[Array[Byte]] = null
  private var compScale: Array[Double] = null
  private var compZero: Array[Double] = null
  private var compBlank: Array[Long] = null
  private var compHasBlank: Array[Boolean] = null

  /** Preads the band's descriptor rows and decompresses its tiles
    * (plus per-tile quantization params for quantized floats). This
    * path serves only non-columnar fallbacks, so it keeps the IO
    * simple (per-band pread, per-payload pread via compTileBytes with
    * no coalesced window). */
  private def loadCompBand(m: HduMeta.CompImage, band: Long): Unit = {
    val bandRows = m.nTileCols
    val bytes = new Array[Byte](bandRows * rowBytes)
    val partFirstBand = part.firstRowIndex / m.tileH
    in.readFully(
      part.startByte + (band - partFirstBand) * bandRows.toLong * rowBytes,
      bytes, 0, bytes.length)
    val bandH = math.min(m.tileH.toLong, m.nLines - band * m.tileH).toInt
    val tiles = new Array[Array[Byte]](bandRows)
    if (m.quant.isDefined && compScale == null) {
      compScale = new Array[Double](bandRows)
      compZero = new Array[Double](bandRows)
      compBlank = new Array[Long](bandRows)
      compHasBlank = new Array[Boolean](bandRows)
    }
    var tc = 0
    var c0 = 0
    while (tc < bandRows) {
      val tw = math.min(m.tileWidth, m.lineElems - c0)
      tiles(tc) = FitsPartitionReader.compTileBytes(m, bytes, tc * rowBytes,
        Array.emptyByteArray, 0L, 0L, in, heapStart, tw * bandH)
      m.quant.foreach { q =>
        val ro = tc * rowBytes
        compScale(tc) =
          if (q.scaleOff >= 0) java.lang.Double.longBitsToDouble(
            ElemType.i64(bytes, ro + q.scaleOff))
          else q.scale
        compZero(tc) =
          if (q.zeroOff >= 0) java.lang.Double.longBitsToDouble(
            ElemType.i64(bytes, ro + q.zeroOff))
          else q.zero
        if (q.blankOff >= 0) {
          compBlank(tc) = ElemType.i32(bytes, ro + q.blankOff).toLong
          compHasBlank(tc) = true
        } else {
          compHasBlank(tc) = q.blank.isDefined
          compBlank(tc) = q.blank.getOrElse(0L)
        }
      }
      c0 += tw
      tc += 1
    }
    compTiles = tiles
    compBand = band
  }

  /** One image line from the cached band's tiles, restricted to the
    * pushed column window [colLo, colLo+colN) (null if any tile
    * INTERSECTING the window holds no data; this fallback reader still
    * decompresses whole bands — tile skipping lives in the vectorized
    * reader). */
  private def assembleLine(m: HduMeta.CompImage, rowInBand: Int,
      colLo: Int, colN: Int): Any = {
    val colEnd = colLo + colN
    var tc = 0
    var c0 = 0
    while (tc < compTiles.length) {
      val tw = math.min(m.tileWidth, m.lineElems - c0)
      if (compTiles(tc) == null && c0 < colEnd && c0 + tw > colLo)
        return null
      c0 += tw
      tc += 1
    }
    val elem = m.elem
    val arr = new Array[Any](colN)
    if (m.quant.isDefined) {
      val isFloat = elem == ElemType.E
      c0 = 0
      tc = 0
      while (tc < compTiles.length) {
        val tw = math.min(m.tileWidth, m.lineElems - c0)
        val srcOff = rowInBand * tw * 4
        val tile = compTiles(tc)
        var j = math.max(0, colLo - c0)
        val jEnd = math.min(tw, colEnd - c0)
        while (j < jEnd) {
          val code = ElemType.i32(tile, srcOff + j * 4)
          arr(c0 + j - colLo) =
            if (compHasBlank(tc) && code.toLong == compBlank(tc)) null
            else if (isFloat)
              java.lang.Float.valueOf(
                (compScale(tc) * code + compZero(tc)).toFloat)
            else java.lang.Double.valueOf(compScale(tc) * code + compZero(tc))
          j += 1
        }
        c0 += tw
        tc += 1
      }
    } else {
      val w = elem.width
      c0 = 0
      tc = 0
      while (tc < compTiles.length) {
        val tw = math.min(m.tileWidth, m.lineElems - c0)
        val srcOff = rowInBand * tw * w
        val tile = compTiles(tc)
        var j = math.max(0, colLo - c0)
        val jEnd = math.min(tw, colEnd - c0)
        while (j < jEnd) {
          arr(c0 + j - colLo) = elem.decode(tile, srcOff + j * w)
          j += 1
        }
        c0 += tw
        tc += 1
      }
    }
    new GenericArrayData(arr)
  }

  /** Zero-allocation decode of one fixed-width row (strings excepted —
    * they inherently allocate). The returned UnsafeRow instance is
    * reused across rows, as Spark's own sources do; downstream
    * operators copy when they buffer. */
  private def writeUnsafe(base: Int): InternalRow = {
    val w = unsafeWriter
    w.reset()
    w.zeroOutNullBytes()
    var i = 0
    while (i < bintableCols.length) {
      val c = bintableCols(i)
      val off = base + c.offset
      c.tform match {
        case TForm.Scalar(_, elem) =>
          elem match {
            case ElemType.L => buf(off) match {
              case 'T' => w.write(i, true)
              case 'F' => w.write(i, false)
              case _ => w.setNullAt(i) // undefined logical
            }
            case ElemType.B => w.write(i, buf(off))
            case ElemType.I => w.write(i, ElemType.s16(buf, off))
            case ElemType.J => w.write(i, readInt(off))
            case ElemType.K => w.write(i, readLong(off))
            case ElemType.E => w.write(i,
              java.lang.Float.intBitsToFloat(readInt(off)))
            case ElemType.D => w.write(i,
              java.lang.Double.longBitsToDouble(readLong(off)))
            case e @ (_: ElemType.ScaledElem | _: ElemType.BlankElem) =>
            throw new IllegalStateException(
              s"scaled element $e cannot take the unsafe path")
          }
        case TForm.Str(_, len) =>
          w.write(i, UTF8String.fromString(
            new String(buf, off, len, "UTF-8").trim))
        case sc: TForm.Scaled =>
          sc.element.sparkType match {
            case org.apache.spark.sql.types.ByteType =>
              w.write(i, sc.element.decodeByteExact(buf, off))
            case org.apache.spark.sql.types.IntegerType =>
              w.write(i, sc.element.decodeIntExact(buf, off))
            case org.apache.spark.sql.types.LongType =>
              w.write(i, sc.element.decodeLongExact(buf, off))
            case _ => w.write(i, sc.element.decodeDouble(buf, off))
          }
        case a: TForm.AsciiInt =>
          a.decode(buf, off) match {
            case null => w.setNullAt(i)
            case v: java.lang.Long => w.write(i, v.longValue())
          }
        case a: TForm.AsciiReal =>
          a.decode(buf, off) match {
            case null => w.setNullAt(i)
            case v: java.lang.Double => w.write(i, v.doubleValue())
          }
        case wn: TForm.WithNull =>
          wn.decode(buf, off) match {
            case null => w.setNullAt(i)
            case v: java.lang.Byte => w.write(i, v.byteValue())
            case v: java.lang.Short => w.write(i, v.shortValue())
            case v: java.lang.Integer => w.write(i, v.intValue())
            case v: java.lang.Long => w.write(i, v.longValue())
            case other => throw new IllegalStateException(s"$other")
          }
        case _ => w.setNullAt(i)
      }
      i += 1
    }
    w.getRow
  }

  @inline private def readInt(o: Int): Int = ElemType.i32(buf, o)
  @inline private def readLong(o: Int): Long = ElemType.i64(buf, o)

  override def close(): Unit = in.close()
}

object FitsPartitionReader {
  /** Upper bound on one variable-length element's payload (256 MB):
    * far above any legitimate array or document, low enough that a
    * corrupt descriptor cannot ask an executor for a multi-GB
    * allocation. */
  val MaxVarElement: Long = 256L << 20

  /** Uncompressed big-endian tile payload for one descriptor row: the
    * COMPRESSED_DATA descriptor, else the GZIP_COMPRESSED_DATA /
    * UNCOMPRESSED_DATA per-tile fallbacks (a tile that didn't compress
    * is stored there with a zero-length main descriptor); null when no
    * column holds data. `nPix` is THIS tile's pixel count — edge tiles
    * of a 2D tiling are narrower/shorter than the declared ZTILE size.
    * Reads from the coalesced heap window when the payload falls inside
    * it, else one positioned read. Shared by the row and vectorized
    * readers and the no-Spark facade. */
  private[fits] def compTileBytes(m: HduMeta.CompImage, rowBuf: Array[Byte],
      base: Int, heapBuf: Array[Byte], heapBase: Long, heapLen: Long,
      in: org.apache.hadoop.fs.FSDataInputStream,
      heapStart: Long, nPix: Int): Array[Byte] = {
    val expect = nPix * m.bytepix
    def payloadOf(off: Int, v: TForm.VarArr): Array[Byte] = {
      val (n0, hoff) = v.descriptor(rowBuf, base + off)
      if (n0 <= 0) return null
      val payload = n0 * v.elem.width
      if (n0 > v.maxLen || payload > MaxVarElement)
        throw new IllegalArgumentException(
          s"corrupt tile descriptor: count $n0 outside [0, ${v.maxLen}] " +
            s"or payload over $MaxVarElement bytes")
      val p = payload.toInt
      if (heapLen > 0 && hoff >= heapBase && hoff + p <= heapBase + heapLen)
        java.util.Arrays.copyOfRange(heapBuf,
          (hoff - heapBase).toInt, (hoff - heapBase).toInt + p)
      else {
        val b = new Array[Byte](p)
        in.readFully(heapStart + hoff, b, 0, p)
        b
      }
    }
    val cdB = payloadOf(m.cd._1, m.cd._2)
    if (cdB != null)
      TileCodec.decompress(m.cmpType, cdB, nPix, m.bytepix,
        m.blocksize, hsmooth = m.hsmooth)
    else {
      val gzB = m.gz.map(g => payloadOf(g._1, g._2)).orNull
      if (gzB != null) TileCodec.gunzip(gzB, expect)
      else {
        val ucB = m.uc.map(u => payloadOf(u._1, u._2)).orNull
        if (ucB == null) null
        else if (ucB.length != expect)
          throw new IllegalArgumentException(
            s"UNCOMPRESSED_DATA tile: ${ucB.length} bytes, expected $expect")
        else ucB
      }
    }
  }
}
