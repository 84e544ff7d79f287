package graft

/** Thread-local switch for plan auditing. A few operators are iterative or
  * must materialize before releasing a cache, so the frame they RETURN is
  * backed by an eager `localCheckpoint` — which `explain` renders as an
  * opaque `Scan ExistingRDD`, hiding the real dataflow from plan review
  * and regression guards.
  *
  * Inside `explainOnly`, those operators skip the materialize/checkpoint
  * step and return the composed logical plan itself (for iterative loops:
  * one round's composition — the shape every round runs). Results in this
  * mode are for `explain`/plan assertions only, NOT for execution: caches
  * the operator would normally release may still be registered, and loop
  * results are a single round, not a fixpoint.
  */
object PlanMode {
  private val flag = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  def isExplainOnly: Boolean = flag.get()

  def explainOnly[T](f: => T): T = {
    flag.set(true)
    try f finally flag.set(false)
  }
}
