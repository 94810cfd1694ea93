package graft.sources.fits

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 batch write for FITS (beyond reference — it has no write path of
  * any kind): `df.write.format("fits").mode("append").save(dir)`.
  *
  * Each partition becomes one standalone `part-*.fits` file (empty
  * primary HDU + one BINTABLE), so a written directory reads straight
  * back through this source's multi-file union — the same part-file
  * layout as Spark's own file sinks. `overwrite` mode deletes the
  * directory's pre-existing `.fits` files at driver commit, after every
  * task has successfully written its (uniquely named) output.
  *
  * FITS rows are fixed-width and headers carry the row count, neither
  * of which is known until a partition is exhausted — so each writer
  * first spills rows to a local temp file (strings length-prefixed)
  * while tracking the row count and per-column maximum string width,
  * then streams the spill back out as the final file. The two-pass
  * shape is also object-store friendly: the upload is a single
  * sequential stream with no header patch-up seek.
  *
  * Supported column types: Boolean/Byte/Short/Int/Long/Float/Double/
  * String (TFORM L/B/I/J/K/E/nA). Numeric nulls write as zero and
  * string nulls as empty — FITS binary tables have no native null
  * representation (the TNULLn convention is integer-only). */
object FitsWriteSupport {
  def pad(s: String, n: Int): String =
    if (s.length >= n) s.take(n) else s + " " * (n - s.length)
  def card(k: String, v: String): String = pad(pad(k, 8) + "= " + pad(v, 20), 80)

  def headerBlock(cards: Seq[String]): Array[Byte] = {
    val s = cards.mkString
    val padded = s + " " * ((2880 - s.length % 2880) % 2880)
    padded.getBytes("US-ASCII")
  }

  /** (TFORM code, fixed byte width; strings resolve width at commit). */
  def elemOf(dt: DataType): (Char, Int) = dt match {
    case BooleanType => ('L', 1)
    case ByteType => ('B', 1)
    case ShortType => ('I', 2)
    case IntegerType => ('J', 4)
    case LongType => ('K', 8)
    case FloatType => ('E', 4)
    case DoubleType => ('D', 8)
    case StringType => ('A', -1)
    case other => throw new IllegalArgumentException(
      s"FITS write does not support column type ${other.simpleString} — " +
        "supported: boolean, byte, short, int, long, float, double, string")
  }

  def validate(schema: StructType): Unit = schema.fields.foreach(f => elemOf(f.dataType))
}

final class FitsWriteBuilder(res: FitsResolution, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new FitsBatchWrite(res, info.schema(), doTruncate)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new FitsStreamingWrite(res, info.schema())
  }
}

/** Streaming sink: each epoch's partitions land as epoch-tagged part
  * files in the target directory (append semantics; at-least-once on
  * recovery, like any non-transactional file sink — replayed epochs
  * write new uniquely-named files). Combined with the micro-batch
  * source this closes the loop: FITS dir → stream transform → FITS dir. */
final class FitsStreamingWrite(res: FitsResolution, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  FitsWriteSupport.validate(schema)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val dir = new Path(res.pathSpec)
    dir.getFileSystem(res.hadoopConf).mkdirs(dir)
    import scala.jdk.CollectionConverters._
    val props = res.hadoopConf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val pathSpec = res.pathSpec
    val s = schema
    new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        new FitsDataWriter(pathSpec, s, partitionId, taskId, props,
          nameTag = s"e$epochId")
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(res.pathSpec).getFileSystem(res.hadoopConf)
    messages.collect { case m: FitsWriteCommitted => m }
      .foreach(m => fs.delete(new Path(m.file), false))
  }
}

final class FitsBatchWrite(res: FitsResolution, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  FitsWriteSupport.validate(schema)

  // captured BEFORE tasks run: overwrite deletes exactly these at commit
  private val preExisting: Seq[String] =
    if (!truncate) Nil
    else try FitsFiles.resolve(res.pathSpec, res.hadoopConf).map(_.toString)
    catch { case _: IllegalArgumentException => Nil }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(res.pathSpec)
    dir.getFileSystem(res.hadoopConf).mkdirs(dir)
    import scala.jdk.CollectionConverters._
    val props = res.hadoopConf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    new FitsDataWriterFactory(res.pathSpec, schema, props)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(res.pathSpec).getFileSystem(res.hadoopConf)
    preExisting.foreach(p => fs.delete(new Path(p), false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(res.pathSpec).getFileSystem(res.hadoopConf)
    messages.collect { case m: FitsWriteCommitted => m }
      .foreach(m => fs.delete(new Path(m.file), false))
  }
}

final case class FitsWriteCommitted(file: String, rows: Long)
    extends WriterCommitMessage

final class FitsDataWriterFactory(dirSpec: String, schema: StructType,
    confProps: Array[(String, String)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FitsDataWriter(dirSpec, schema, partitionId, taskId, confProps)
}

final class FitsDataWriter(dirSpec: String, schema: StructType,
    partitionId: Int, taskId: Long, confProps: Array[(String, String)],
    nameTag: String = "")
    extends DataWriter[InternalRow] {
  import FitsWriteSupport._

  private val fields = schema.fields
  private val elems: Array[(Char, Int)] = fields.map(f => elemOf(f.dataType))
  private val strWidth: Array[Int] = Array.fill(fields.length)(1)
  private var nRows = 0L

  private val tmp: File = File.createTempFile("fits-write-spill", ".bin")
  private val spill = new DataOutputStream(
    new BufferedOutputStream(new FileOutputStream(tmp), 1 << 20))

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < fields.length) {
      val nul = row.isNullAt(i)
      fields(i).dataType match {
        // FITS logical stores ASCII 'T'/'F' bytes, not 1/0
        case BooleanType =>
          spill.writeByte(if (!nul && row.getBoolean(i)) 'T' else 'F')
        case ByteType => spill.writeByte(if (nul) 0 else row.getByte(i))
        case ShortType => spill.writeShort(if (nul) 0 else row.getShort(i))
        case IntegerType => spill.writeInt(if (nul) 0 else row.getInt(i))
        case LongType => spill.writeLong(if (nul) 0L else row.getLong(i))
        case FloatType => spill.writeFloat(if (nul) 0f else row.getFloat(i))
        case DoubleType => spill.writeDouble(if (nul) 0d else row.getDouble(i))
        case StringType =>
          val b =
            if (nul) Array.emptyByteArray else row.getUTF8String(i).getBytes
          if (b.length > strWidth(i)) strWidth(i) = b.length
          spill.writeInt(b.length)
          spill.write(b)
        case other => throw new IllegalStateException(other.simpleString)
      }
      i += 1
    }
    nRows += 1
  }

  override def commit(): WriterCommitMessage = {
    spill.close()
    val widths: Array[Int] = elems.zipWithIndex.map { case ((_, w), i) =>
      if (w >= 0) w else strWidth(i)
    }
    val rowBytes = widths.sum
    val tag = if (nameTag.isEmpty) "" else s"-$nameTag"
    val file = new Path(dirSpec,
      f"part-$partitionId%05d-$taskId$tag%s-${UUID.randomUUID().toString.take(8)}.fits")
    val conf = new Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val out = file.getFileSystem(conf).create(file, false)
    val in = new DataInputStream(
      new java.io.BufferedInputStream(new FileInputStream(tmp), 1 << 20))
    try {
      out.write(headerBlock(Seq(card("SIMPLE", "T"), card("BITPIX", "8"),
        card("NAXIS", "0"), pad("END", 80))))
      val colCards = fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
        val (code, _) = elems(i)
        val tform = if (code == 'A') s"${widths(i)}A" else code.toString
        Seq(card(s"TTYPE${i + 1}", "'" + pad(f.name, 8) + "'"),
          card(s"TFORM${i + 1}", "'" + pad(tform, 8) + "'"))
      }
      out.write(headerBlock(Seq(
        card("XTENSION", "'BINTABLE'"), card("BITPIX", "8"),
        card("NAXIS", "2"), card("NAXIS1", rowBytes.toString),
        card("NAXIS2", nRows.toString), card("PCOUNT", "0"),
        card("GCOUNT", "1"), card("TFIELDS", fields.length.toString)) ++
        colCards :+ pad("END", 80)))
      // replay the spill: numerics are already big-endian (DataOutput),
      // strings get right-padded with ASCII spaces to their column width
      var r = 0L
      val copyBuf = new Array[Byte](8)
      while (r < nRows) {
        var i = 0
        while (i < fields.length) {
          val (code, w) = elems(i)
          if (code == 'A') {
            val len = in.readInt()
            val b = new Array[Byte](len)
            in.readFully(b)
            out.write(b)
            var p = len
            while (p < widths(i)) { out.write(' '); p += 1 }
          } else {
            in.readFully(copyBuf, 0, w)
            out.write(copyBuf, 0, w)
          }
          i += 1
        }
        r += 1
      }
      val dataLen = rowBytes * nRows
      val padLen = ((dataLen + 2879) / 2880 * 2880 - dataLen).toInt
      out.write(new Array[Byte](padLen))
    } finally {
      out.close()
      in.close()
      tmp.delete()
    }
    FitsWriteCommitted(file.toString, nRows)
  }

  override def abort(): Unit = { spill.close(); tmp.delete() }
  override def close(): Unit = ()
}
