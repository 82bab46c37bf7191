package graft.util

/** Opt-in per-stage wall-clock attribution for multi-job operators —
  * round-16 verdict #7: `w_incr_dedup` moved as one 25-second aggregate,
  * so a regression anywhere inside the wave couldn't be localized from
  * the bench record. A harness that wants stage detail calls [[enable]]
  * before the operator and [[collect]] after; the instrumented operator
  * calls [[mark]] at its stage boundaries (free when disabled — one
  * thread-local read). Times are seconds since the previous mark on the
  * same thread, accumulated per stage name across repeated marks.
  */
object StageTimer {
  private val acc = new ThreadLocal[Option[
    scala.collection.mutable.LinkedHashMap[String, Double]]] {
    override def initialValue() = None
  }
  private val last = new ThreadLocal[java.lang.Long] {
    override def initialValue(): java.lang.Long = 0L
  }

  /** Start (or reset) collection on this thread. */
  def enable(): Unit = {
    acc.set(Some(scala.collection.mutable.LinkedHashMap.empty))
    last.set(System.nanoTime())
  }

  /** Attribute the time since the previous mark to `stage`. No-op when
    * collection is not enabled on this thread. */
  def mark(stage: String): Unit = acc.get().foreach { m =>
    val now = System.nanoTime()
    m.put(stage, m.getOrElse(stage, 0.0) + (now - last.get()) / 1e9)
    last.set(now)
  }

  /** The collected stages in mark order, and stop collecting. */
  def collect(): Seq[(String, Double)] = {
    val out = acc.get().map(_.toSeq).getOrElse(Seq.empty)
    acc.set(None)
    out
  }
}
