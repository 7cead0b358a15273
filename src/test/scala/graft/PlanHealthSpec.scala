package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-health regression locks: filter pushdown, column pruning, and
  * broadcast joins must survive future refactors — a correct-but-full-scan
  * plan is a failure at 100 TB even when results match.
  */
class PlanHealthSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def explain(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q01 pushes both predicates into the parquet scan") {
    val plan = explain("q01_scan_filter_project")
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(l_shipdate"),
      "shipdate predicate not pushed")
    assert(plan.contains("GreaterThan(l_quantity"), "quantity predicate not pushed")
  }

  test("q01 prunes the read schema to referenced columns only") {
    val plan = explain("q01_scan_filter_project")
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_returnflag"),
      s"unpruned scan: $readSchema")
  }

  test("dim-table joins broadcast") {
    assert(explain("q13_join_broadcast").contains("BroadcastHashJoin"))
    assert(explain("q14_join_semi").contains("BroadcastHashJoin"))
  }

  test("event-type filters push down through the interp-join union") {
    val plan = explain("q10_interp_join")
    assert(plan.contains("EqualTo(event_type,view)") &&
      plan.contains("EqualTo(event_type,click)"),
      "event_type filters not pushed to the source scans")
  }

  test("window queries partition by user_id (no single-partition shuffle)") {
    val plan = explain("q07_cumsum")
    assert(plan.contains("hashpartitioning(user_id"),
      "cumsum window not partitioned by user_id")
  }

  test("withQualitySignals tokenizes exactly once (no expression re-evaluation)") {
    // Round-5 regression class: the Column-algebra signal form let
    // CollapseProject inline split(text) + its filter-scans into every
    // reference (~100x plan blowup, 26 s warm for q47 at sf0.1). Lock the
    // single-pass shape: the optimized plan must contain exactly one
    // split() of the text column.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.operators.Corpus.withQualitySignals(docs, "text")
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).size
    assert(splits == 1, s"expected exactly one split(text) in the optimized plan, found $splits")
  }

  test("unpruned-scan detector fires on a full wide read, stays quiet when pruned") {
    // synthetic formatted-explain fragments: the audit must flag a scan of
    // every documents column and pass a pruned one
    val tables = Map("documents" -> 5, "region" -> 3)
    val full =
      """Location: InMemoryFileIndex [file:/x/documents.parquet]
        |ReadSchema: struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>
        |""".stripMargin
    val pruned =
      """Location: InMemoryFileIndex [file:/x/documents.parquet]
        |ReadSchema: struct<doc_id:bigint,text:string>
        |""".stripMargin
    val narrowDim =
      """Location: InMemoryFileIndex [file:/x/region.parquet]
        |ReadSchema: struct<r_regionkey:bigint,r_name:string,r_comment:string>
        |""".stripMargin
    assert(PlanAudit.unprunedScans(full, tables) == Seq(("documents", 5)))
    assert(PlanAudit.unprunedScans(pruned, tables).isEmpty)
    assert(PlanAudit.unprunedScans(narrowDim, tables).isEmpty,
      "narrow dims are exempt from the wide-read rule")
  }

  test("ReadSchema field counter handles nested struct columns") {
    // colon-counting overcounts nested fields (ADVICE r7); the counter must
    // count top-level fields only, so a 2-of-5 pruned read with a nested
    // struct column is NOT flagged as unpruned
    assert(PlanAudit.topLevelFieldCount(
      "ReadSchema: struct<doc_id:bigint,meta:struct<w:int,h:int,codec:string>>") == 2)
    assert(PlanAudit.topLevelFieldCount(
      "ReadSchema: struct<a:int,b:map<string,struct<x:int,y:int>>,c:array<struct<z:int>>>") == 3)
    assert(PlanAudit.topLevelFieldCount("ReadSchema: struct<>") == 0)
    val nested =
      """Location: InMemoryFileIndex [file:/x/documents.parquet]
        |ReadSchema: struct<doc_id:bigint,meta:struct<w:int,h:int,codec:string>>
        |""".stripMargin
    assert(PlanAudit.unprunedScans(nested, Map("documents" -> 5)).isEmpty,
      "pruned read with a nested struct column must not be flagged")
  }

  test("unpruned-scan detector catches q48's whole-document read on the real plan") {
    // q48 returns the surviving full docs, so its documents read is
    // legitimately unpruned AND the detector must see it (it is allowlisted
    // in PlanAudit.main, not invisible to the check)
    val found = PlanAudit.unprunedScans(explain("q48_dedup_corpus"),
      Map("documents" -> 5))
    assert(found.contains(("documents", 5)),
      s"expected the full documents read to be detected, got $found")
  }

  test("bounded-shortlist IVF-PQ serve carries a map-side pre-rank") {
    // the serve-path twin of PlanAudit's topKWindowAudited check: with a
    // BOUNDED shortlist (the production shape — the q56e/f identities use
    // Int.MaxValue, which disables the rewrite by design) the shortlist
    // window's `row_number() <= k` filter must plan a Partial
    // WindowGroupLimit, so a degenerate probe (one query hitting a
    // mega-cell) is pre-ranked map-side before the q_id shuffle instead
    // of funneling every candidate row through one task
    import org.apache.spark.sql.functions.col
    val e = graft.queries.Common.table(spark, dir, "embeddings")
    val idx = graft.operators.Similarity.buildIvfPq(e, nCells = 8,
      dim = 64, m = 8, ksub = 16)
    val probe = graft.operators.Similarity.probeIvfPq(idx,
      e.where(col("vec_id") < 4), e, 5, nProbe = 2, shortlist = 50)
    val plan = probe.queryExecution.executedPlan.toString
    // same-line check (PlanAudit.hasPartialWindowGroupLimit): a Final-mode
    // WindowGroupLimit plus a stray "Partial" elsewhere must not pass
    assert(PlanAudit.hasPartialWindowGroupLimit(plan),
      "bounded-shortlist probeIvfPq lost its map-side pre-rank:\n" + plan)
  }

  test("partial-WindowGroupLimit detector requires the mode on the node's line") {
    assert(PlanAudit.hasPartialWindowGroupLimit(
      "WindowGroupLimit [q#1], [s#2 DESC], row_number(), 10, Partial\n+- Scan"))
    // Final-mode pre-rank + an unrelated Partial aggregate: NOT a map-side
    // pre-rank, must fail the audit
    assert(!PlanAudit.hasPartialWindowGroupLimit(
      "WindowGroupLimit [q#1], [s#2 DESC], row_number(), 10, Final\n" +
      "+- HashAggregate(keys=[k#3], functions=[partial_sum(v#4)], Partial)"))
  }

  test("grid xbin lookup is a broadcast dim-join, not a plan literal") {
    // q62 drives GridOutput.withXbin: the profile->xbin map must enter the
    // plan as a broadcast join against the dim frame — an O(profiles)
    // `map(...)` literal would be a multi-MB plan at fleet scale.
    val plan = explain("q62_depth_bias_hist")
    assert(plan.contains("BroadcastHashJoin"),
      "withXbin is not a broadcast dim-join")
    assert(!plan.contains("map_from_arrays") && !plan.contains("CreateMap"),
      "profile->xbin baked into the plan as a literal map")
  }
}
