package graft.harness

/** Wall-clock phase timing for the alert lifecycle, mirroring the
  * reference's `Timer` context manager (src/alertas/timer.py:5-13,
  * wrapped around every alert build and table write at
  * jobs.py:189,260,286): each phase reports its elapsed seconds through
  * a pluggable sink, so the slow detector in a 16-alert run is visible
  * from the logs without a profiler.
  *
  * The default sink prints to driver stdout like the reference's
  * `print("Elapsed ...")` — NOT slf4j INFO, which GraftSession's
  * `setLogLevel("WARN")` would silently suppress in every session this
  * engine builds. Tests substitute a recording sink to assert the hook
  * fires per phase.
  */
object Timed {
  /** (phase name, elapsed seconds) */
  type Sink = (String, Double) => Unit

  val logSink: Sink = (name, secs) =>
    println(f"[timed] $name%s: $secs%.3f s")

  /** Run `body`, reporting its wall-clock to `sink` even on failure
    * (a phase that dies after 40 minutes should still say so). */
  def phase[T](name: String, sink: Sink = logSink)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally sink(name, (System.nanoTime() - t0) / 1e9)
  }
}
