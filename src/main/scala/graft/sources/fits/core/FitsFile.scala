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
    * for anything large). */
  def rows(bufferRows: Int = 1024): Iterator[Seq[Any]] = meta match {
    case b: HduMeta.Bintable => new Iterator[Seq[Any]] {
      private val in = path.getFileSystem(conf).open(path)
      private val chunk = math.max(1, bufferRows)
      private val buf = new Array[Byte](chunk * b.rowBytes)
      private var read = 0L
      private var inChunk = 0
      private var chunkRows = 0
      override def hasNext: Boolean = {
        val more = read < b.nRows
        if (!more) in.close()
        more
      }
      override def next(): Seq[Any] = {
        if (inChunk >= chunkRows) {
          chunkRows = math.min(chunk.toLong, b.nRows - read).toInt
          in.readFully(bounds.dataStart + read * b.rowBytes, buf, 0,
            chunkRows * b.rowBytes)
          inChunk = 0
        }
        val base = inChunk * b.rowBytes
        val row = b.columns.map(c => c.tform.decode(buf, base + c.offset))
        inChunk += 1
        read += 1
        row
      }
    }
    case i: HduMeta.Image => new Iterator[Seq[Any]] {
      private val in = path.getFileSystem(conf).open(path)
      private val buf = new Array[Byte](i.rowBytes)
      private var read = 0L
      override def hasNext: Boolean = {
        val more = read < i.nRows
        if (!more) in.close()
        more
      }
      override def next(): Seq[Any] = {
        in.readFully(bounds.dataStart + read * i.rowBytes, buf, 0, i.rowBytes)
        val line = (0 until i.lineElems)
          .map(j => i.elem.decode(buf, j * i.elem.width))
        val row = Seq(line, read)
        read += 1
        row
      }
    }
    case HduMeta.Opaque => Iterator.empty
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
