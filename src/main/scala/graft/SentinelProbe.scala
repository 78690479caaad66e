package graft

/** Sentinel calibration: print N warmed (cpu, mem, io) triples with
  * loadavg — how the idle bands in SCALE.md (and the memory notes) are
  * measured. Run on a SETTLED host (no sbt/tests for ~3 min):
  *
  *   tools/run_main.sh graft.SentinelProbe [samples]
  */
object SentinelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(6)
    val sent = new HostSentinels.Warmed
    (1 to n).foreach { i =>
      println(f"[sentinel] sample $i%2d  ${sent.line()}")
      Thread.sleep(500)
    }
    println(s"[sentinel] blackhole=${HostSentinels.blackhole}")
  }
}
