package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Conf-driven engine installation: `spark.sql.extensions=graft.GraftExtensions`
  * injects the native SQL functions into every session built with the conf — the
  * deployment path for clusters where user code never touches a registration call
  * (spark-submit, Thrift/Connect servers, notebooks). [[GraftSession.builder]] sets it
  * by default; [[graft.functions.Registry.registerAll]] remains for attaching to an
  * already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.Registry.injectables.foreach(ext.injectFunction)
    // native SQL UPDATE/MERGE INTO on graft catalog tables: a post-hoc
    // resolution rule (runs before CheckAnalysis would refuse them for
    // non-row-level DSv2 tables) routes the resolved commands into the
    // versioned table's merge-on-read commit paths
    ext.injectPostHocResolutionRule(session =>
      new sources.table.GraftRowLevelSqlRule(session))
  }
}
