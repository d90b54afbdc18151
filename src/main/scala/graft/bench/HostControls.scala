package graft.bench

/**
 * Non-CPU host controls for the bench artifact. The CPU kernel
 * (KernelControl) is cache-resident compute and is BLIND to contention on
 * the resources the Spark-heavy queries actually saturate — the r3
 * attribution proved the shuffle stages are memory-bus-bound, and the r5
 * artifact showed 2-18x wall-clock inflation on Spark blocks while every
 * CPU kernel read fast. These controls measure those resources directly,
 * in-session, so an artifact can self-diagnose WHICH resource was
 * contended instead of reading as an engine regression:
 *
 *  - `bandwidthGBps`: multi-threaded streaming write+read over a 1 GiB
 *    heap array — far beyond L3, so the number tracks DRAM bandwidth the
 *    same way shuffle ser/deser does.
 *  - `diskMBps`: a ~100 MB file write (fsync'd) + cold-ish read-back under
 *    /tmp — tracks the page-cache/disk path the parquet scans and shuffle
 *    spills ride.
 */
object HostControls {

  private val BufLongs = (1L << 30).toInt / 8

  // Sink for the read pass so the loop cannot be dead-code-eliminated.
  @volatile private var blackhole: Long = 0L

  /** Aggregate streaming memory bandwidth in GB/s over `nThreads` threads:
    * each thread sweeps a disjoint slice with one write pass + one read
    * pass per repetition. Bytes counted = 16 per element per rep (8 written
    * + 8 read); real traffic is higher (write-allocate reads the line
    * first), so the number is a LOWER bound — fine for a control whose job
    * is comparing one artifact's windows against each other.
    *
    * The 1 GiB buffer is allocated PER CALL and released on return: a
    * resident control buffer would shrink the heap every timed Spark run
    * executes in — the control must not contaminate the measurement it
    * validates. Allocation + first-touch happen in the untimed warmup
    * pass. */
  def bandwidthGBps(nThreads: Int, reps: Int = 2): Double = {
    val buf = new Array[Long](BufLongs)
    def pass(reps: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val chunk = BufLongs / nThreads
      val t0 = System.nanoTime()
      val futs = (0 until nThreads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val lo = t * chunk
            val hi = if (t == nThreads - 1) BufLongs else lo + chunk
            var r = 0
            while (r < reps) {
              var i = lo
              while (i < hi) { buf(i) = i + r; i += 1 }
              var s = 0L
              i = lo
              while (i < hi) { s += buf(i); i += 1 }
              blackhole = s
              r += 1
            }
          }
        })
      }
      try futs.foreach(_.get())
      finally pool.shutdownNow()
      val secs = (System.nanoTime() - t0) / 1e9
      reps.toDouble * BufLongs * 16 / secs / 1e9
    }
    pass(1) // warmup: first-touch + JIT
    pass(reps)
  }

  /** (write MB/s incl. fsync, read-back MB/s) for a `sizeMB` file under
    * `dir`. The read-back typically serves from page cache — which is the
    * point: local shuffle/parquet reads ride the same path, and a host
    * whose page cache is being thrashed by a co-tenant shows up here while
    * the CPU kernel stays fast. */
  def diskMBps(dir: String = "/tmp", sizeMB: Int = 100): (Double, Double) = {
    val path = java.nio.file.Paths.get(dir,
      s"graft_io_probe_${ProcessHandle.current().pid()}.bin")
    val block = new Array[Byte](1 << 20)
    java.util.concurrent.ThreadLocalRandom.current().nextBytes(block)
    try {
      val t0 = System.nanoTime()
      val out = new java.io.FileOutputStream(path.toFile)
      try {
        var i = 0
        while (i < sizeMB) { out.write(block); i += 1 }
        out.getFD.sync()
      } finally out.close()
      val wSecs = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val in = new java.io.FileInputStream(path.toFile)
      var sink = 0L
      try {
        var n = in.read(block)
        while (n > 0) { sink += block(0) + n; n = in.read(block) }
      } finally in.close()
      blackhole = sink
      val rSecs = (System.nanoTime() - t1) / 1e9
      (sizeMB / wSecs, sizeMB / rSecs)
    } finally java.nio.file.Files.deleteIfExists(path)
  }
}
