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
