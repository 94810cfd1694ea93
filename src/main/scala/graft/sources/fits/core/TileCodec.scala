package graft.sources.fits.core

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Tile (de)compression dispatch for the FITS Tiled Image Compression
  * convention. Every codec maps compressed bytes → the tile's
  * uncompressed big-endian pixel payload (nPix × bytepix bytes), so the
  * reader's element decode is codec-independent.
  *
  *  - RICE_1      — [[Rice]] (integer types only)
  *  - GZIP_1      — gzip of the raw big-endian payload (any type)
  *  - GZIP_2      — gzip of the byte-plane-shuffled payload (all most-
  *                  significant bytes first, then the next plane, …)
  *  - NOCOMPRESS  — identity
  */
object TileCodec {

  val Supported: Set[String] = Set("RICE_1", "GZIP_1", "GZIP_2", "NOCOMPRESS")

  def decompress(cmpType: String, comp: Array[Byte], nPix: Int,
      bytepix: Int, blocksize: Int): Array[Byte] = cmpType match {
    case "RICE_1" => Rice.decode(comp, nPix, bytepix, blocksize)
    case "GZIP_1" => gunzip(comp, nPix * bytepix)
    case "GZIP_2" => unshuffle(gunzip(comp, nPix * bytepix), bytepix)
    case "NOCOMPRESS" =>
      if (comp.length != nPix * bytepix)
        throw new IllegalArgumentException(
          s"NOCOMPRESS tile: ${comp.length} bytes for $nPix×$bytepix pixels")
      comp
    case other =>
      throw new IllegalArgumentException(s"unsupported ZCMPTYPE '$other'")
  }

  def compress(cmpType: String, tile: Array[Byte], bytepix: Int,
      blocksize: Int): Array[Byte] = cmpType match {
    case "RICE_1" => Rice.encode(tile, bytepix, blocksize)
    case "GZIP_1" => gzip(tile)
    case "GZIP_2" => gzip(shuffle(tile, bytepix))
    case "NOCOMPRESS" => tile
    case other =>
      throw new IllegalArgumentException(s"unsupported ZCMPTYPE '$other'")
  }

  def gunzip(comp: Array[Byte], expect: Int): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(comp))
    try {
      val out = new Array[Byte](expect)
      var off = 0
      var n = 0
      while (off < expect && { n = in.read(out, off, expect - off); n > 0 })
        off += n
      if (off != expect) throw new IllegalArgumentException(
        s"gzip tile: expected $expect bytes, got $off")
      out
    } finally in.close()
  }

  def gzip(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val out = new GZIPOutputStream(bos)
    out.write(raw); out.finish(); out.close()
    bos.toByteArray
  }

  /** GZIP_2 byte-plane transpose: plane b holds byte b of every pixel. */
  def shuffle(raw: Array[Byte], bytepix: Int): Array[Byte] = {
    val n = raw.length / bytepix
    val out = new Array[Byte](raw.length)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < bytepix) { out(b * n + i) = raw(i * bytepix + b); b += 1 }
      i += 1
    }
    out
  }

  def unshuffle(shuffled: Array[Byte], bytepix: Int): Array[Byte] = {
    val n = shuffled.length / bytepix
    val out = new Array[Byte](shuffled.length)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < bytepix) { out(i * bytepix + b) = shuffled(b * n + i); b += 1 }
      i += 1
    }
    out
  }
}
