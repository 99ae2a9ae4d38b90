package graft.core

/** Thread-local scoped options — TelluricContext parity
  * (`/root/reference/telluric/context.py`, tests/test_telluric_context.py):
  * nested scopes OVERLAY the enclosing options and RESTORE them on exit;
  * each thread sees only its own stack. The reference threads rasterio env
  * options through this; here it carries engine knobs (e.g. `plot.max_rows`
  * consumed by [[graft.serve.Plot]]). */
object GraftContext {

  private val local = new ThreadLocal[Map[String, Any]] {
    override def initialValue(): Map[String, Any] = Map.empty
  }

  def get(key: String): Option[Any] = local.get.get(key)

  def getInt(key: String, default: Int): Int =
    local.get.get(key) match {
      case Some(n: Number) => n.intValue
      case Some(s: String) =>
        try s.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"context option $key is not an int: $s")
        }
      case Some(other) => throw new IllegalArgumentException(
        s"context option $key is not an int: $other")
      case None => default
    }

  def options: Map[String, Any] = local.get

  /** `with TelluricContext(**opts): body` — overlay for the dynamic extent
    * of `body`, restore the previous options afterwards (even on throw). */
  def scoped[T](opts: (String, Any)*)(body: => T): T = {
    val prev = local.get
    local.set(prev ++ opts)
    try body
    finally local.set(prev)
  }
}
