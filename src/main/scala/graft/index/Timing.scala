package graft.index

/** Opt-in stage timing (`GRAFT_TIMING=1`): stderr lines `[timing] label s`.
  * Used to attribute the build's serialized stage-boundary time when tuning
  * the N→4N scaling efficiency (BENCH/BASELINE.md protocol) — the ratio's
  * Amdahl term is exactly the sum of the stages that do NOT shrink with
  * cores.
  */
object Timing {
  val enabled: Boolean = sys.env.contains("GRAFT_TIMING")
  def timed[A](label: String)(body: => A): A =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      val a = body
      System.err.println(f"[timing] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
}
