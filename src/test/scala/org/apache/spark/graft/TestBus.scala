package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to the private[spark] listener bus: lets specs drain
  * in-flight listener events so job-counting windows can't bleed into each
  * other (the bus is async; a loaded suite can delay delivery past any
  * fixed poll interval).
  */
object TestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
