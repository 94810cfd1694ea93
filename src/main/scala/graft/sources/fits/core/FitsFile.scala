package graft.sources.fits.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Direct-library facade (no Spark required) mirroring the reference's
  * `new Fits(path, conf, hduIndex)` usage surface (FitsLib.scala:173-238,
  * exercised by its FitsLibTest): header access, HDU counting, boundary
  * math, and row iteration for one HDU.
  *
  * {{{
  * val f = FitsFile.open("file:///data/cat.fits", hdu = 1)
  * f.header("NAXIS1"); f.nRows; f.schema
  * f.rows().take(10)   // Iterator[Seq[Any]]
  * }}}
  */
final class FitsFile private (
    val path: Path,
    val conf: Configuration,
    val hduIndex: Int,
    val hdus: Vector[Hdu]) {

  require(hduIndex >= 0 && hduIndex < hdus.length,
    s"HDU index $hduIndex does not exist in $path (file has ${hdus.length})")

  def nHdus: Int = hdus.length
  def hdu: Hdu = hdus(hduIndex)
  def header: FitsHeader = hdu.header
  def headerComments: Map[String, String] = hdu.header.comments
  def bounds: HduBounds = hdu.bounds
  def meta: HduMeta = hdu.meta
  def nRows: Long = meta.nRows
  def rowBytes: Int = meta.rowBytes
  def schema: org.apache.spark.sql.types.StructType = meta.schema

  /** Sequential row iterator (driver-side convenience, like the
    * reference's manual setCursor/getRow loop — use the Spark connector
    * for anything large). Each buffered chunk opens, preads and closes
    * the file, so a partially-consumed iterator never leaks a stream.
    */
  def rows(bufferRows: Int = 1024): Iterator[Seq[Any]] = {
    def readChunk(startByte: Long, len: Int): Array[Byte] = {
      val in = path.getFileSystem(conf).open(path)
      try {
        val buf = new Array[Byte](len)
        in.readFully(startByte, buf, 0, len)
        buf
      } finally in.close()
    }
    meta match {
      case b: HduMeta.Bintable =>
        val chunk = math.max(1, bufferRows)
        (0L until b.nRows by chunk).iterator.flatMap { first =>
          val n = math.min(chunk.toLong, b.nRows - first).toInt
          val buf = readChunk(bounds.dataStart + first * b.rowBytes,
            n * b.rowBytes)
          (0 until n).iterator.map { r =>
            val base = r * b.rowBytes
            b.columns.map(c => c.tform.decode(buf, base + c.offset)): Seq[Any]
          }
        }
      case i: HduMeta.Image =>
        val chunk = math.max(1, bufferRows)
        (0L until i.nRows by chunk).iterator.flatMap { first =>
          val n = math.min(chunk.toLong, i.nRows - first).toInt
          val buf = readChunk(bounds.dataStart + first * i.rowBytes,
            n * i.rowBytes)
          (0 until n).iterator.map { r =>
            val base = r * i.rowBytes
            val line = (0 until i.lineElems)
              .map(j => i.elem.decode(buf, base + j * i.elem.width))
            Seq(line, first + r): Seq[Any]
          }
        }
      case c: HduMeta.CompImage =>
        val chunk = math.max(1, bufferRows)
        def payload(buf: Array[Byte], base: Int,
            col: (Int, TForm.VarArr)): Array[Byte] = {
          val (n0, hoff) = col._2.descriptor(buf, base + col._1)
          if (n0 <= 0) null
          else {
            // same descriptor sanity bounds as the connector path
            // (FitsPartitionReader.compTileBytes): a corrupt or hostile
            // descriptor must fail loudly, not drive a near-2GB
            // allocation or a negative-size pread via (n0*width).toInt
            val bytes = n0 * col._2.elem.width
            if (n0 > col._2.maxLen ||
              bytes > graft.sources.fits.FitsPartitionReader.MaxVarElement)
              throw new IllegalArgumentException(
                s"corrupt tile descriptor in $path: count $n0 outside " +
                  s"[0, ${col._2.maxLen}] or payload over " +
                  s"${graft.sources.fits.FitsPartitionReader.MaxVarElement} bytes")
            readChunk(c.heapStart + hoff, bytes.toInt)
          }
        }
        (0L until c.nTiles by chunk).iterator.flatMap { first =>
          val n = math.min(chunk.toLong, c.nTiles - first).toInt
          val buf = readChunk(bounds.dataStart + first * c.tableRowBytes,
            n * c.tableRowBytes)
          (0 until n).iterator.map { r =>
            val base = r * c.tableRowBytes
            val cdB = payload(buf, base, c.cd)
            val tile =
              if (cdB != null) TileCodec.decompress(c.cmpType, cdB,
                c.lineElems, c.bytepix, c.blocksize)
              else {
                val gzB = c.gz.map(payload(buf, base, _)).orNull
                if (gzB != null)
                  TileCodec.gunzip(gzB, c.lineElems * c.bytepix)
                else c.uc.map(payload(buf, base, _)).orNull
              }
            val line =
              if (tile == null) null
              else (0 until c.lineElems)
                .map(j => c.elem.decode(tile, j * c.elem.width))
            Seq(line, first + r): Seq[Any]
          }
        }
      case HduMeta.Opaque => Iterator.empty
    }
  }
}

object FitsFile {
  def open(pathStr: String, hdu: Int,
      conf: Configuration = new Configuration()): FitsFile = {
    val path = new Path(pathStr)
    val hdus = FitsStructure.scan(path.getFileSystem(conf), path)
    new FitsFile(path, conf, hdu, hdus)
  }
}
