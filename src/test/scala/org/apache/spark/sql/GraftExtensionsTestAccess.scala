package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge: `SparkSessionExtensions.registerFunctions` is
  * `private[sql]`, and GraftExtensionsSpec wants to exercise the exact
  * registration path session construction uses without touching the
  * shared test session's lifecycle.
  */
object GraftExtensionsTestAccess {
  def registerFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
