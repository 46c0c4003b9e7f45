package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Referees for the ustar walker (q207 / VERDICT-r9 stretch item 8).
  * GNU tar itself is the independent referee in both directions: our
  * walker must parse what `tar --format=ustar` writes (incl. the
  * prefix-split long path and a directory entry), and GNU tar must
  * list/extract what `Tar.tarEntry` writes. Plus the corrupted-input
  * discipline: truncation and flip sweeps never throw.
  */
class TarSpec extends AnyFunSuite {

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private def sh(cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val outTxt = new String(p.getInputStream.readAllBytes)
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")}: $outTxt")
  }

  test("GNU-tar referee: a --format=ustar archive with nested dirs " +
      "and a prefix-split >100-char path parses with exact names, " +
      "sizes, checksums and body MD5s") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tar").toFile
    val deep = new java.io.File(dir,
      "very/" + ("sub" * 30) + "/leafdir") // path > 100 chars → prefix
    assert(deep.mkdirs())
    val files = Seq(
      ("a.txt", "hello tar".getBytes),
      ("very/" + ("sub" * 30) + "/leafdir/deep.bin",
        Array.tabulate[Byte](700)(i => (i * 7).toByte)),
      ("b.dat", Array.emptyByteArray))
    for ((n, b) <- files) {
      val f = new java.io.File(dir, n)
      java.nio.file.Files.write(f.toPath, b)
    }
    val tarF = new java.io.File(dir, "out.tar")
    sh("tar", "--format=ustar", "-cf", tarF.getAbsolutePath,
      "-C", dir.getAbsolutePath, "a.txt", "very", "b.dat")
    val got = Tar.parseEntries(
      java.nio.file.Files.readAllBytes(tarF.toPath)).get
    assert(got.forall(_.chksum_ok), got.toString)
    val byName = got.map(e => e.name -> e).toMap
    for ((n, b) <- files) {
      val e = byName(n)
      assert(e.size == b.length.toLong, s"$n size")
      assert(e.bodyMd5 == md5hex(b), s"$n md5")
      assert(e.typeflag == '0' || e.typeflag == 0.toChar, s"$n flag")
    }
    // directory entries present with size 0 and typeflag '5'
    assert(got.exists(e => e.typeflag == '5' && e.size == 0L))
  }

  test("our writer is GNU-readable: tar -tf lists tarEntry names and " +
      "tar -xOf extracts the exact bytes") {
    val body = Array.tabulate[Byte](1300)(i => (i * 13 + 5).toByte)
    val arch = Tar.tarEntry("x/y.bin", body) ++
      Tar.tarEntry("z.txt", "zz".getBytes) ++ Tar.tarEnd
    val dir = java.nio.file.Files.createTempDirectory("graft_tarw")
    val f = dir.resolve("own.tar")
    java.nio.file.Files.write(f, arch)
    val p = new ProcessBuilder("tar", "-tf", f.toString).start()
    val listed = new String(p.getInputStream.readAllBytes).split("\n").toSeq
    assert(p.waitFor() == 0 && listed == Seq("x/y.bin", "z.txt"), listed)
    val px = new ProcessBuilder("tar", "-xOf", f.toString, "x/y.bin").start()
    val bytes = px.getInputStream.readAllBytes()
    assert(px.waitFor() == 0 && bytes.toSeq == body.toSeq)
    // and our own walker round-trips it too
    val es = Tar.parseEntries(arch).get
    assert(es.map(_.name) == Seq("x/y.bin", "z.txt"))
    assert(es.head.bodyMd5 == md5hex(body) && es.forall(_.chksum_ok))
  }

  test(".tar.gz composition: gzip member walk (T104) over a REAL " +
      "`tar | gzip -n` archive, then the ustar walk — the q195→q207 " +
      "pipeline on real bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tgz").toFile
    java.nio.file.Files.write(new java.io.File(dir, "f1").toPath,
      "one".getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "f2").toPath,
      ("y" * 600).getBytes)
    val tarF = new java.io.File(dir, "a.tar")
    sh("tar", "--format=ustar", "-cf", tarF.getAbsolutePath,
      "-C", dir.getAbsolutePath, "f1", "f2")
    sh("gzip", "-n", tarF.getAbsolutePath)
    val gz = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "a.tar.gz").toPath)
    val members = Compressed.memberPayloads(gz).get
    assert(members.length == 1) // tar.gz = ONE member wrapping the tar
    val es = Tar.parseEntries(members.head._2).get
    assert(es.map(e => e.name -> e.size).toMap ==
      Map("f1" -> 3L, "f2" -> 600L))
    assert(es.forall(_.chksum_ok))
  }

  test("truncation sweep: every 512-multiple prefix lacking the " +
      "terminator → None; non-multiples → None; never a throw") {
    val arch = Tar.tarEntry("a", Array.tabulate[Byte](100)(_.toByte)) ++
      Tar.tarEntry("b", Array.tabulate[Byte](600)(_.toByte)) ++ Tar.tarEnd
    for (cut <- 0 to arch.length) {
      val got =
        try Tar.parseEntries(arch.take(cut))
        catch { case e: Throwable => fail(s"cut=$cut threw: $e") }
      if (cut == arch.length) assert(got.exists(_.length == 2))
      else assert(got.isEmpty, s"cut=$cut must not parse")
    }
    // GNU blocking-factor padding: extra zero blocks after the
    // terminator are accepted
    assert(Tar.parseEntries(arch ++ new Array[Byte](512 * 6))
      .exists(_.length == 2))
  }

  test("corruption: a flipped checksum digit yields chksum_ok=false " +
      "on that entry only (walk continues); a corrupted size field " +
      "kills the walk structurally (None); flips never throw") {
    val arch = Tar.tarEntry("a", "abcdef".getBytes) ++
      Tar.tarEntry("b", "ghij".getBytes) ++ Tar.tarEnd
    val m1 = arch.clone()
    m1(148) = (if (m1(148) == '1') '2' else '1').toByte
    val es = Tar.parseEntries(m1).get
    assert(es.map(_.chksum_ok) == Seq(false, true))
    assert(es.map(_.bodyMd5) ==
      Seq(md5hex("abcdef".getBytes), md5hex("ghij".getBytes)))
    val m2 = arch.clone()
    m2(124) = 'x'.toByte // size field no longer octal
    assert(Tar.parseEntries(m2).isEmpty)
    for (i <- arch.indices) {
      val m = arch.clone(); m(i) = (m(i) ^ 0x40).toByte
      try Tar.parseEntries(m)
      catch { case e: Throwable => fail(s"flip@$i threw: $e") }
    }
  }
}
