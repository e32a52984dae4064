package graft

import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.Media

/** E5 multimodal plumbing: binary schema, partition-wise transforms,
  * fixed output shapes, frame fan-out.
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    rows.map { case (id, s) => Media(id, s.getBytes("UTF-8")) }.toDS()

  test("extractFeatures computes deterministic byte stats per payload") {
    val got = MultimodalOps.extractFeatures(media((1L, "abc"))).head()
    assert(got.n_bytes == 3 && got.byte_sum == 'a' + 'b' + 'c')
    assert(got.head.toSeq == "abc".getBytes("UTF-8").toSeq)
  }

  test("resize pads short and truncates long payloads to the exact shape") {
    val out = MultimodalOps.resize(media((1L, "ab"), (2L, "abcdefgh")), 4)
      .collect().sortBy(_.doc_id)
    assert(out(0).payload.toSeq == Seq('a'.toByte, 'b'.toByte, 0.toByte, 0.toByte))
    assert(out(1).payload.toSeq == "abcd".getBytes("UTF-8").toSeq)
  }

  test("sampleFrames keeps every k-th fixed-size block with its index") {
    val out = MultimodalOps.sampleFrames(media((1L, "aabbccdd")), 2, 2)
      .orderBy("frame_idx")
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 2L)) // frames 0 and 2 of 4
    assert(new String(out(0).getAs[Array[Byte]]("frame")) == "aa")
    assert(new String(out(1).getAs[Array[Byte]]("frame")) == "cc")
  }
}
