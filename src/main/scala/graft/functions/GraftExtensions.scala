package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** Standard integration point: enable the graft functions in ANY session
  * with `spark.sql.extensions=graft.functions.GraftExtensions` (e.g. on
  * spark-submit to a real cluster) — the config-driven twin of the
  * runtime `GraftFunctions.register` used when the driver owns the
  * session. Both paths inject the SAME (identifier, info, builder)
  * triples ([[GraftFunctions.all]]), so they cannot diverge.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
