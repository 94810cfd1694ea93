package graft.sources.fits

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.fits.core._

/** Executor-side reader of one row-aligned byte slice.
  *
  * Reads the slice in large buffered chunks (default 4 MB, row-aligned;
  * `recordlength` overrides) and decodes straight to `InternalRow` —
  * no intermediate `Row`/`Seq[Row]` boxing layer like the reference's
  * RecordReader (FitsRecordReader.scala:380-392). Because partitions
  * were planned row-aligned on the driver, there is no split-rejection
  * or rewind logic here at all.
  */
final class FitsPartitionReader(part: FitsInputPartition)
    extends PartitionReader[InternalRow] {

  private val path = new Path(part.file)
  private val in = path.getFileSystem(new Configuration()).open(path)

  private val rowBytes = part.rowBytes
  private val rowsPerChunk: Int = {
    val byBuffer = math.max(1L, part.bufferBytes.toLong / rowBytes)
    math.min(byBuffer, part.numRows).toInt
  }
  private val buf = new Array[Byte](rowsPerChunk * rowBytes)

  private var chunkFirstRow = 0L // row index (within slice) of buf(0)
  private var chunkRows = 0 // valid rows currently in buf
  private var rowInChunk = 0 // next row to emit, relative to chunk
  private var emitted = 0L // rows emitted so far

  // Per-column converter closures resolved once, not per value.
  private val converters: Array[(Array[Byte], Int) => Any] = part.spec match {
    case DecodeSpec.Bintable(cols) => cols.map(converterFor)
    case _: DecodeSpec.Image => Array.empty
  }

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
      case _: TForm.Unsupported =>
        (_, _) => null
    }
  }

  override def next(): Boolean = {
    if (emitted >= part.numRows) return false
    if (rowInChunk >= chunkRows) fill()
    true
  }

  private def fill(): Unit = {
    chunkFirstRow = emitted
    chunkRows = math.min(rowsPerChunk.toLong, part.numRows - emitted).toInt
    in.readFully(part.startByte + chunkFirstRow * rowBytes, buf, 0,
      chunkRows * rowBytes)
    rowInChunk = 0
  }

  override def get(): InternalRow = {
    val base = rowInChunk * rowBytes
    val row = part.spec match {
      case DecodeSpec.Bintable(_) =>
        val values = new Array[Any](converters.length)
        var i = 0
        while (i < converters.length) {
          values(i) = converters(i)(buf, base)
          i += 1
        }
        new GenericInternalRow(values)
      case DecodeSpec.Image(elem, lineElems, fieldKinds) =>
        val values = new Array[Any](fieldKinds.length)
        var i = 0
        while (i < fieldKinds.length) {
          values(i) =
            if (fieldKinds(i) == 0) {
              val arr = new Array[Any](lineElems)
              var j = 0
              while (j < lineElems) {
                arr(j) = elem.decode(buf, base + j * elem.width)
                j += 1
              }
              new GenericArrayData(arr)
            } else java.lang.Long.valueOf(part.firstRowIndex + emitted)
          i += 1
        }
        new GenericInternalRow(values)
    }
    rowInChunk += 1
    emitted += 1
    row
  }

  override def close(): Unit = in.close()
}
