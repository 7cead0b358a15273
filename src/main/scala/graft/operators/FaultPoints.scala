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
  * synchronously at the chosen point. Production never touches this —
  * the default handler is a no-op and the call sites are outside every
  * timed/leased region.
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
}
