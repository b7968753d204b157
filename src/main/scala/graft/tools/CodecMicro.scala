package graft.tools

/** Throwaway micro-benchmark (r18 optimization round): how much of the
  * media-family query time is raw javax.imageio / javax.sound per-call
  * overhead, and how much a per-partition reader/writer-reuse saves.
  * Run: `sbt "runMain graft.tools.CodecMicro"`. Not part of any query.
  */
object CodecMicro {
  private def gray(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val n = 5000
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-42s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def mkImg(id: Long): java.awt.image.BufferedImage = {
      val (w, h) = ((id % 8 + 4).toInt, (id % 6 + 3).toInt)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < h) { var x = 0; while (x < w) { r.setSample(x, y, 0, gray(id, x, y)); x += 1 }; y += 1 }
      img
    }
    // warmup
    (0 until 500).foreach { i =>
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(mkImg(i), "png", o)
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(o.toByteArray))
    }
    val blobs = new Array[Array[Byte]](n)
    time(s"ImageIO.write x$n") {
      var i = 0
      while (i < n) {
        val o = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(mkImg(i), "png", o)
        blobs(i) = o.toByteArray; i += 1
      }
    }
    time(s"ImageIO.read x$n") {
      var i = 0
      while (i < n) {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blobs(i))); i += 1
      }
    }
    // reused writer/reader
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    time(s"reused ImageWriter x$n") {
      var i = 0
      while (i < n) {
        val o = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(o)
        w.setOutput(ios); w.write(mkImg(i)); ios.flush()
        blobs(i) = o.toByteArray; i += 1
      }
    }
    val r = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    time(s"reused ImageReader x$n") {
      var i = 0
      while (i < n) {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(blobs(i)))
        r.setInput(iis, true, true); r.read(0); i += 1
      }
    }
    // WAV
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val wavs = new Array[Array[Byte]](n)
    time(s"AudioSystem.write x$n") {
      var i = 0
      while (i < n) {
        val ns = (i % 50 + 30)
        val pcm = new Array[Byte](ns * 2)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong)
        val o = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, o)
        wavs(i) = o.toByteArray; i += 1
      }
    }
    time(s"AudioSystem.getAudioInputStream+read x$n") {
      var i = 0
      while (i < n) {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wavs(i)))
        in.readAllBytes(); in.close(); i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val aw = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.find(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE)).get
    time(s"reused spi AudioFileWriter x$n") {
      var i = 0
      while (i < n) {
        val ns = (i % 50 + 30)
        val pcm = new Array[Byte](ns * 2)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, ns.toLong)
        val o = new java.io.ByteArrayOutputStream()
        aw.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, o)
        wavs(i) = o.toByteArray; i += 1
      }
    }
    val ar = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.flatMap { rd =>
        try { rd.getAudioInputStream(new java.io.ByteArrayInputStream(wavs(0))); Some(rd) }
        catch { case _: Exception => None }
      }.toSeq.head
    time(s"reused spi AudioFileReader x$n") {
      var i = 0
      while (i < n) {
        val in = ar.getAudioInputStream(new java.io.ByteArrayInputStream(wavs(i)))
        in.readAllBytes(); in.close(); i += 1
      }
    }
  }
}
