package graft.queries

import graft.SparkSpec
import graft.multimodal.SyntheticMedia

/** The multimodal catalog entries are rows-only for the driver (binary
  * decode — no SQL oracle); this spec IS their oracle: exact planted pair
  * sets for the perceptual dedup entries, and generator-recomputed
  * digests for the AVI demux entry.
  */
class MmQueriesSpec extends SparkSpec {

  test("q_mm_imgdup finds exactly the 8 planted resize pairs") {
    val rows = MultimodalQueries.queries("q_mm_imgdup")(spark, sf0001).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (0 until 8).map(i =>
      (f"img_$i%03d_base.png", f"img_$i%03d_copy.png")).toSet
    assert(pairs === expected)
    // every planted pair is perceptually CLOSE, not merely under the cut
    rows.foreach(r => assert(r.getInt(2) <= 5, r.toString))
  }

  test("q_mm_audiodup finds exactly the 6 planted gain-copy pairs") {
    val rows = MultimodalQueries.queries("q_mm_audiodup")(spark, sf0001).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (0 until 6).map(i =>
      (f"aud_$i%03d_base.wav", f"aud_$i%03d_gain.wav")).toSet
    assert(pairs === expected)
  }

  test("q_mm_avi frame counts and digests match the generator") {
    val rows = MultimodalQueries.queries("q_mm_avi")(spark, sf0001).collect()
    assert(rows.length === 6)
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) === f"vid_$i%02d.avi")
      val n = 3 + i
      assert(r.getLong(1) === n.toLong, s"frame count of vid $i")
      // the demux emits the exact JPEG payloads the generator packed, so
      // the expected digest chain recomputes locally from the generator
      val chain = (0 until n)
        .map(f => md5hex(SyntheticMedia.jpegFrame(i, f))).mkString("|")
      assert(r.getString(2) === md5hex(chain.getBytes("UTF-8")), s"vid $i")
    }
  }

  test("all three entries are run-deterministic") {
    for (q <- Seq("q_mm_imgdup", "q_mm_audiodup", "q_mm_avi")) {
      val a = MultimodalQueries.queries(q)(spark, sf0001).collect().map(_.toString)
      val b = MultimodalQueries.queries(q)(spark, sf0001).collect().map(_.toString)
      assert(a.toSeq === b.toSeq, q)
    }
  }
}
