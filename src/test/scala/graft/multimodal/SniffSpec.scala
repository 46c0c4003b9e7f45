package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the MIME sniffer (q214, T123): real encoder output
  * (ImageIO PNG/JPEG/BMP/GIF, JDK gzip/zip, the engine's own WAV/tar
  * writers), the WHATWG tag-termination and whitespace-skip rules,
  * and the exact binary-data-byte boundary set (0x1B ESC is a TEXT
  * byte; 0x0B is binary).
  */
class SniffSpec extends AnyFunSuite {

  private def imageIoBytes(fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(1, 1, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
    bos.toByteArray
  }

  test("real encoder outputs sniff to their types") {
    assert(Sniff.sniff(imageIoBytes("png")) == "image/png")
    assert(Sniff.sniff(imageIoBytes("jpg")) == "image/jpeg")
    assert(Sniff.sniff(imageIoBytes("bmp")) == "image/bmp")
    assert(Sniff.sniff(imageIoBytes("gif")) == "image/gif")

    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("hello".getBytes); g.close(); bos.toByteArray
    }
    assert(Sniff.sniff(gz) == "application/x-gzip")

    val zip = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("a"))
      z.write(1); z.closeEntry(); z.close(); bos.toByteArray
    }
    assert(Sniff.sniff(zip) == "application/zip")

    assert(Sniff.sniff(Tar.tarEntry("x", "b".getBytes) ++ Tar.tarEnd) ==
      "application/x-tar")
    assert(Sniff.sniff(AudioVideo.syntheticWav(2, 1, 8000, 8,
      (_, _) => 0)) == "audio/wave")
  }

  test("HTML patterns: whitespace skip, case-insensitivity, " +
      "tag-terminating byte required") {
    assert(Sniff.sniff("<!DOCTYPE html><html>".getBytes) == "text/html")
    assert(Sniff.sniff("\r\n\t  <HtMl lang=x>".getBytes) == "text/html")
    assert(Sniff.sniff("<p>hi".getBytes) == "text/html")
    assert(Sniff.sniff("<a href=x>l</a>".getBytes) == "text/html")
    assert(Sniff.sniff("<!-- c -->".getBytes) == "text/html")
    // no tag-terminating byte -> not HTML
    assert(Sniff.sniff("<abc>".getBytes) == "text/plain")
    assert(Sniff.sniff("<html".getBytes) == "text/plain") // EOF, no term
    assert(Sniff.sniff("  <?xml version=\"1.0\"?>".getBytes) == "text/xml")
    // %PDF- does NOT get the whitespace skip
    assert(Sniff.sniff("%PDF-1.7".getBytes) == "application/pdf")
    assert(Sniff.sniff("  %PDF-1.7".getBytes) == "text/plain")
  }

  test("RIFF family discriminates on bytes 8-11; ftyp at offset 4") {
    val riff = "RIFF".getBytes ++ Array[Byte](1, 2, 3, 4)
    assert(Sniff.sniff(riff ++ "WAVE".getBytes) == "audio/wave")
    assert(Sniff.sniff(riff ++ "WEBP".getBytes) == "image/webp")
    assert(Sniff.sniff(riff ++ "AVI ".getBytes) == "video/avi")
    // bare RIFF with unknown subtype falls through to the byte scan,
    // where the 0x01-0x04 size bytes are binary-data bytes
    assert(Sniff.sniff(riff ++ "XXXX".getBytes) ==
      "application/octet-stream")
    assert(Sniff.sniff(Array[Byte](0, 0, 0, 24) ++
      "ftypisom".getBytes) == "video/mp4")
    // real RAR4 magic is 'Rar!' 1A 07 00 (not 'Rar ' — a typo in an
    // old WHATWG draft, since corrected)
    assert(Sniff.sniff("Rar!".getBytes ++ Array[Byte](0x1a, 0x07, 0x00)) ==
      "application/x-rar-compressed")
    assert(Sniff.sniff("Rar ".getBytes ++ Array[Byte](0x1a, 0x07)) !=
      "application/x-rar-compressed")
  }

  test("binary-data-byte boundaries: 0x1B ESC is text, 0x0B is binary") {
    assert(Sniff.sniff("plain ascii".getBytes) == "text/plain")
    assert(Sniff.sniff(Array[Byte](0x1b, 'a')) == "text/plain")
    assert(Sniff.sniff(Array[Byte](0x0b)) == "application/octet-stream")
    assert(Sniff.sniff(Array[Byte](0x00)) == "application/octet-stream")
    assert(Sniff.sniff(Array[Byte](0x08)) == "application/octet-stream")
    assert(Sniff.sniff(Array[Byte](0x09, 0x0a, 0x0d, 0x0c, 0x20)) ==
      "text/plain")
    assert(Sniff.sniff(Array[Byte](0x1a)) == "application/octet-stream")
    assert(Sniff.sniff(Array[Byte](0x1c)) == "application/octet-stream")
    // binary byte past the 1445-byte window is not scanned
    assert(Sniff.sniff(Array.fill[Byte](1445)('a') :+ 0x00.toByte) ==
      "text/plain")
    assert(Sniff.sniff(Array.fill[Byte](1444)('a') :+ 0x00.toByte) ==
      "application/octet-stream")
    // BOMs short-circuit to text/plain before the scan
    assert(Sniff.sniff(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte,
      0x00)) == "text/plain")
    assert(Sniff.sniff(Array[Byte](0xfe.toByte, 0xff.toByte, 0x00, 0x41)) ==
      "text/plain")
  }

  test("truncated signatures never match or throw; empty is text/plain") {
    assert(Sniff.sniff(Array.empty[Byte]) == "text/plain")
    // PNG prefix cut: 0x89 is NOT a WHATWG binary-data byte (high
    // bytes are presumed UTF-8), so the scan says text
    assert(Sniff.sniff(Array[Byte](0x89.toByte, 'P')) == "text/plain")
    assert(Sniff.sniff("GIF8".getBytes) == "text/plain")
    assert(Sniff.sniff("RIFF".getBytes) == "text/plain")
    assert(Sniff.sniff("usta".getBytes) == "text/plain")
  }

  test("agrees: aliases accepted both directions, others exact") {
    assert(Sniff.agrees("application/gzip", "application/x-gzip"))
    assert(Sniff.agrees("Application/GZIP", "application/x-gzip"))
    assert(Sniff.agrees("audio/x-wav", "audio/wave"))
    assert(Sniff.agrees("application/xml", "text/xml"))
    assert(Sniff.agrees("text/html", "text/html"))
    assert(!Sniff.agrees("text/html", "text/plain"))
    assert(!Sniff.agrees("application/pdf", "image/png"))
  }
}
