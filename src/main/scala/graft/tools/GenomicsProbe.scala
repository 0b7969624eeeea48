package graft.tools

import graft.genomics.{Bcl, SyntheticRun}

/** Container-format decode throughput probe: the SAME synthetic run at
  * `perTile` clusters per tile (×2 tiles, 11 cycles) written flat,
  * BGZF-blocked, and CBCL (excludeNonPF), each decoded through
  * `Bcl.decodeRun`. Records wall time + rows so BASELINE.md carries a
  * measured container-overhead row instead of a guess. Warm-up pass on a
  * tiny run compiles the shapes outside the measured window (the
  * CodegenProbe lesson).
  *
  * Usage: tools/run.sh graft.tools.GenomicsProbe [perTile]
  */
object GenomicsProbe {
  def main(args: Array[String]): Unit = {
    val perTile = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = graft.core.Sessions.build(
      graft.core.Sessions.local(appName = "graft-genomics-probe"))
    spark.sparkContext.setLogLevel("WARN")
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_gprobe_$tag")
    // warm-up: compile decode shapes on a tiny run
    Bcl.decodeRun(spark,
      SyntheticRun.writeRun(tmp("warm"), 24).toString, SyntheticRun.rs).count()
    val flat = SyntheticRun.writeRun(tmp("flat"), perTile)
    val bgzf = SyntheticRun.writeRun(tmp("bgzf"), perTile, bgzf = true, bgzfBlock = 0xff00)
    val cbcl = SyntheticRun.writeRunCbcl(tmp("cbcl"), perTile)
    def du(p: java.nio.file.Path): Long = {
      var total = 0L
      java.nio.file.Files.walk(p).forEach { f =>
        if (java.nio.file.Files.isRegularFile(f))
          total += java.nio.file.Files.size(f)
      }
      total
    }
    for ((tag, dir) <- Seq("flat" -> flat, "bgzf" -> bgzf, "cbcl" -> cbcl)) {
      val t0 = System.nanoTime()
      val n = Bcl.decodeRun(spark, dir.toString, SyntheticRun.rs).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE decode[$tag] perTile=$perTile rows=$n " +
        f"wall=$secs%.2f s bytesOnDisk=${du(dir)}")
    }
    spark.stop()
  }
}
