package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Public `SparkSessionExtensions` entry point: makes every graft native
  * function available in sessions the USER builds —
  *
  *   spark.sql.extensions=graft.GraftExtensions           (config), or
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * — so `graft_dot`, `graft_srp_keys`, etc. resolve in plain SQL with no
  * runtime registration call. [[graft.functions.Native.register]] remains
  * the path for sessions that already exist (notebooks, shared drivers).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Native.injectInto(ext)
}
