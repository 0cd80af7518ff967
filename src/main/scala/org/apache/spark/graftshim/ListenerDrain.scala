package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for the work-metric instruments
  * ([[graft.tools.TimeQuery]] `WORK=1`, [[graft.Bench]]'s per-query
  * cpu/shuffle columns).
  *
  * The async listener bus delivers stage-completed events a beat after
  * the job's collect/save returns; the first WORK implementation settled
  * with fixed 500 ms sleeps, which on the very host-stall conditions the
  * tool exists to work around could bill a rep's late events to the next
  * rep (r11 ADVICE). `LiveListenerBus.waitUntilEmpty()` is the exact
  * primitive — block until every posted event has been dispatched to
  * every queue — but it is `private[spark]`, hence this one-method shim
  * under the `org.apache.spark` package (the
  * [[org.apache.spark.sql.graftshim.ColumnBridge]] technique,
  * measurement-harness only: nothing on a query's execution path).
  *
  * The 10 s default dispatch timeout throwing is the RIGHT behavior for
  * a measurement harness — a bus that can't drain in 10 s means the
  * numbers are unattributable and the rep must not be reported quietly.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
