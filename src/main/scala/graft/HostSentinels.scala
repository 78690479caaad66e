package graft

/** Fixed-work HOST-IDLENESS sentinels, shared by every measurement main
  * (`Bench`, `LoopStress`, `TakedownProbe`, `IngestProbe`): zero-Spark
  * probes whose wall time depends only on this process's share of one
  * core (cpu) and of memory bandwidth (mem). A measurement that prints
  * its own in-band sentinel pair is SELF-attributing — an out-of-band
  * query row next to in-band sentinels is the code's fault; next to
  * high sentinels it's the host's (the contaminated-official-run
  * failure mode r15/r16 hit, and the 3.69–7.89 s contain-probe swing
  * SCALE.md could only attribute by circumstance). Idle bands, measured
  * on this host (SCALE.md): cpu 0.26–0.45 s, mem 0.15–0.25 s steady
  * (first samples after allocation can read lower while pages are
  * freshly provisioned).
  *
  * Lifted verbatim from `Bench` (round 17) so every record's sentinel
  * values stay comparable across rounds and mains.
  */
object HostSentinels {

  /** Prevents the JIT from eliding the sentinel loops; read it (e.g.
    * print once at suite end) so the value is observably live.
    */
  @volatile var blackhole: Long = 0L

  /** Fixed-work PURE-CPU sentinel: 2^28 splitmix64 mixes on one thread. */
  def cpu(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0
    while (i < (1 << 28)) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      acc ^= z ^ (z >>> 31)
      i += 1
    }
    blackhole ^= acc
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed-work MEMORY-BANDWIDTH sentinel: 8 sequential sweeps over a
    * 128 MiB long array (≫ LLC — every sweep streams from DRAM, ~1 GiB
    * of traffic). Catches what the CPU sentinel can't: a co-tenant
    * saturating bandwidth or host-side swap pushing this process's
    * pages to the slow tier (measured round 5: cold re-reads at
    * ~50 MB/s).
    */
  def mem(arr: Array[Long]): Double = {
    val t0 = System.nanoTime()
    var s = 0L
    var sweep = 0
    while (sweep < 8) {
      var i = 0
      while (i < arr.length) { s += arr(i); i += 1 }
      sweep += 1
    }
    blackhole ^= s
    (System.nanoTime() - t0) / 1e9
  }

  def loadavg(): String =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")),
      java.nio.charset.StandardCharsets.UTF_8).trim
    catch { case _: Throwable => "" }

  def memAvailableKb(): Long =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/meminfo")),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.find(_.startsWith("MemAvailable:"))
      .map(_.split("\\s+")(1).toLong).getOrElse(-1L)
    catch { case _: Throwable => -1L }

  /** A warmed sentinel pair: allocation + first touch of the sweep array
    * and one untimed run of each sentinel happen HERE (fresh-page
    * provisioning is the host's slowest path, and pass-1 values must
    * measure the host, not the JIT), so every [[sample]] is comparable.
    */
  final class Warmed {
    private val arr = Array.tabulate(16 << 20)(_.toLong)
    cpu(); mem(arr)

    /** One (cpu_sec, mem_sec) sample. */
    def sample(): (Double, Double) = (cpu(), mem(arr))

    /** Sample and render the standard record fragment the probe mains
      * print next to each measured leg.
      */
    def line(): String = {
      val (c, m) = sample()
      f"sentinel_cpu=$c%.3f s sentinel_mem=$m%.3f s loadavg=${loadavg()}"
    }
  }
}
