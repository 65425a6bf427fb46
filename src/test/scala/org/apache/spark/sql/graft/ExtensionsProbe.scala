package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into the `private[sql]` extension-application API, so specs can
  * verify what a conf-built session would actually receive from GraftExtensions.
  */
object ExtensionsProbe {
  def registeredInto(ext: SparkSessionExtensions): FunctionRegistry =
    ext.registerFunctions(FunctionRegistry.builtin.clone())
}
