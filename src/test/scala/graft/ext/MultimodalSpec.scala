package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("catalog: byte length and magic prefix of the payload") {
    val r = Multimodal.catalog(docs(1L -> "hello world")).collect().head
    assert(r.getAs[Int]("n_bytes") === 11)
    assert(r.getAs[String]("magic_hex") === "68656C6C") // 'hell'
  }

  test("decodeStub: deterministic dims, empty payload marked not-ok") {
    val ds = Multimodal.assets(docs(1L -> "hello", 2L -> "")).as[Multimodal.Asset]
    val out = Multimodal.decodeStub(ds).collect()
      .map(d => d.doc_id -> d).toMap
    assert(out(1L).width === 64 + ('h'.toInt % 16) * 32)
    assert(out(1L).ok)
    assert(!out(2L).ok)
  }

  test("encodePng/decodePng: REAL ImageIO round trip — magic bytes, dims, " +
      "pixel checksum") {
    val ds = Multimodal.assets(docs(
      1L -> "hi",                 // 2 bytes -> 32x1, padded with zeros
      2L -> ("x" * 33),           // 33 bytes -> 32x2
      3L -> "")                   // empty -> 32x1, all-zero pixels
    ).as[Multimodal.Asset]
    val pngs = Multimodal.encodePng(ds).collect().map(a => a.doc_id -> a).toMap
    // a real PNG container: the 8-byte signature is fixed by the spec
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    pngs.values.foreach { a =>
      assert(a.payload.take(8).sameElements(sig), "PNG signature")
      assert(a.format === "image/png")
    }
    val dec = Multimodal.decodePng(Multimodal.encodePng(ds)).collect()
      .map(d => d.doc_id -> d).toMap
    assert(dec(1L).width === 32 && dec(1L).height === 1)
    assert(dec(1L).px_checksum === 'h'.toInt + 'i'.toInt)
    assert(dec(2L).width === 32 && dec(2L).height === 2)
    assert(dec(2L).px_checksum === 33L * 'x'.toInt)
    assert(dec(3L).width === 32 && dec(3L).height === 1)
    assert(dec(3L).px_checksum === 0L)
  }

  test("decodePng decodes ANY grayscale PNG, not just encodePng's output") {
    // hand-built 2x2 image through the codec directly — proves the decode
    // side is a real parser with no knowledge of the upstream encoder
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 10)
    img.getRaster.setSample(1, 0, 0, 20)
    img.getRaster.setSample(0, 1, 0, 30)
    img.getRaster.setSample(1, 1, 0, 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(Multimodal.Asset(7L, bos.toByteArray, "image/png"))
      .toDS()
    val d = Multimodal.decodePng(ds).collect().head
    assert(d.width === 2 && d.height === 2 && d.px_checksum === 100L)
  }

  test("featuresStub: L1-normalized fixed-dim histogram") {
    val ds = Multimodal.assets(docs(1L -> "aaaa")).as[Multimodal.Asset]
    val f = Multimodal.featuresStub(ds).collect().head
    assert(f.feature.length === 16)
    assert(math.abs(f.feature.sum - 1.0f) < 1e-6)
    assert(f.feature('a'.toInt % 16) === 1.0f)
  }

  test("resizeStub: short payload passes through; long one downsamples " +
      "at floor(i*n/m)") {
    val short = Multimodal.assets(docs(1L -> "abcd")).as[Multimodal.Asset]
    val r1 = Multimodal.resizeStub(short).collect().head
    assert((r1.n_bytes_in, r1.n_bytes_out) === ((4, 4)))
    assert(r1.checksum === "abcd".map(_.toLong).sum)
    // n=6 -> m=4: positions floor(i*6/4) = 0,1,3,4 -> a,b,d,e
    val long = Multimodal.assets(docs(2L -> "abcdef")).as[Multimodal.Asset]
    val r2 = Multimodal.resizeStub(long, outLen = 4).collect().head
    assert((r2.n_bytes_in, r2.n_bytes_out) === ((6, 4)))
    assert(r2.checksum === "abde".map(_.toLong).sum)
  }

  test("sampleFrames: strided fixed-width slices, short tail dropped") {
    val text = ("x" * 100)
    val frames = Multimodal.sampleFrames(docs(1L -> text)).collect()
    // idx 0 at offset 0 and idx 1 at offset 64 fit in 100 bytes; offset 128 doesn't
    assert(frames.length === 2)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length === 16))
  }
}
