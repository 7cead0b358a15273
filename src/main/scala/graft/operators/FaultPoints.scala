package graft.operators

/** Test-only interleaving seam for the multi-table index maintenance
  * verbs. The per-table writer lease serializes writers of ONE table;
  * maintenance OPERATIONS that touch several tables of an index (a BM25
  * delete rewriting doclens→postings→stats, an LSH append landing
  * shingles→bands) interleave at table granularity — the scope honestly
  * documented at [[IndexFiles]]. The verb×verb interleaving specs
  * (`IndexInterleaveSpec`) prove each unordered verb pair lands in a
  * repairable state by injecting the competing operation at exactly the
  * window between an operation's table writes: each multi-table verb
  * calls [[afterTable]] once per completed table write, while holding NO
  * lease; a spec swaps in a handler that runs the competing verb
  * synchronously at the chosen point. Verbs whose table writes overlap
  * as concurrent driver jobs (compact and delete, since r19) fire both
  * hooks AFTER both writes — still lease-free, but the between-writes
  * window is no longer an injectable seam there. Production never
  * touches this — the default handler is a no-op and the call sites are
  * outside every timed/leased region.
  */
private[graft] object FaultPoints {

  /** (op, justCompletedTable) — e.g. ("bm25.append", "postings"). */
  @volatile var afterTable: (String, String) => Unit = (_, _) => ()

  /** Install a handler for the duration of `body`, restoring the no-op
    * after — the spec-side bracket (handlers must not leak across tests).
    */
  def withHook[T](handler: (String, String) => Unit)(body: => T): T = {
    afterTable = handler
    try body finally afterTable = (_, _) => ()
  }

  /** (op, tableAboutToBeWritten) — fired INSIDE the table's writer
    * lease, immediately before the fence check that guards an
    * append-mode write ([[IndexFiles]]'s checkStillHeld). Exists so the
    * fenced-append spec can stage a takeover deterministically in the
    * exact window the fence closes (a stall between lease acquisition
    * and the write job starting). Unlike [[afterTable]], handlers run
    * under a HELD lease — they must not acquire the same table's lease.
    * Production never touches it.
    */
  @volatile var beforeFencedWrite: (String, String) => Unit = (_, _) => ()

  def withPreWriteHook[T](handler: (String, String) => Unit)(body: => T): T = {
    beforeFencedWrite = handler
    try body finally beforeFencedWrite = (_, _) => ()
  }
}
