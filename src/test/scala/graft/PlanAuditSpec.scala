package graft

/** Catalog-wide physical-plan audit: every query's plan is built and scanned
  * for scale red flags. Queries that intentionally use a pattern are
  * allowlisted — additions to the allowlists need a scale justification.
  */
class PlanAuditSpec extends SparkSpec {

  // brute-force and PQ-ADC scoring are deliberate broadcast-crosses (query
  // side tiny; the candidate side streams through one codegen'd projection).
  // q_llm_ann_int8 is the same brute-force shape (broadcast 10-query side,
  // ≠-join); q_llm_bm25's "cartesian" is the 1-row corpus-stats table
  // cross-joined onto the vocabulary-sized idf build — both O(candidates).
  // q_llm_hybrid inherits BOTH allowed shapes: bm25's 1-row stats cross
  // join and the broadcast 1-row query-vector scoring pass.
  // q_llm_contrastive's positives are the q_llm_sim_topk broadcast
  // brute-force shape; q_profile_chi2's cross join builds the full
  // |A|×|B| category grid — category-sized × category-sized, never rows.
  // q_evt_abtest cross-joins the 1-row control-stats table.
  // q_llm_ann_binary is the q_llm_ann_int8 broadcast brute-force shape
  // (10-query side, ≠-join); q_graph_hits cross-joins the TWO 1-row
  // normalizer aggregates; q_evt_seasonal cross-joins the 1-row grand
  // mean onto the 24-row hourly table. q_llm_mmr's pool stage and
  // q_llm_two_stage's coarse stage are the same broadcast brute-force
  // ANN shape (tiny query side × candidate scan). q_geo_knn crosses the
  // 5-row probe table over the point scan (broadcast brute-force k-NN,
  // probe side driver-sized by contract). q_evt_ccf cross-joins its TWO
  // 1-row sufficient-stat aggregates (n/sums, then dx/dy) onto the
  // |days|-row daily series — the q_evt_seasonal shape. q_agg_theta
  // pair-joins the 5-row per-type sketch table with an inequality
  // (group-count² rows, sketches are ≤1024 longs each).
  private val allowedCartesian =
    Set("q_llm_sim_topk", "q_join_cross_theta", "q_llm_ann_pq",
      "q_llm_ann_int8", "q_llm_bm25", "q_llm_hybrid", "q_llm_contrastive",
      "q_profile_chi2", "q_evt_abtest", "q_llm_ann_binary", "q_graph_hits",
      "q_evt_seasonal", "q_llm_mmr", "q_llm_two_stage", "q_geo_knn",
      "q_evt_ccf", "q_agg_theta")
  // streaming queries build via a memory sink; skip plan construction
  private def planned = SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot(_._1.startsWith("q_stream_"))
    .filterNot(_._1.startsWith("q_scan_csv")) // writes a tmp csv on build
    .filterNot(_._1.startsWith("q_scan_json"))
    .filterNot(_._1.startsWith("q_scan_orc")) // writes a tmp orc on build

  test("no unintended cartesian products across the catalog") {
    val offenders = planned.flatMap { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      if ((plan.contains("CartesianProduct") ||
           plan.contains("BroadcastNestedLoopJoin")) &&
          !allowedCartesian(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"unexpected cartesian/nested-loop in: $offenders")
  }

  test("every parquet scan prunes columns (no SELECT * scans)") {
    // every table has >5 columns; a pruned scan should read fewer unless the
    // query genuinely touches them all
    val fullScanOk = Set("q_scan_parquet") // count(*) reads minimal schema anyway
    val offenders = planned.flatMap { case (name, fn) =>
      val scans = fn(spark, sf0001).queryExecution.executedPlan
        .collectLeaves().map(_.toString).filter(_.contains("FileScan parquet"))
      val wide = scans.exists { s =>
        val m = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(s)
        m.exists(_.group(1).split(",").length > 8)
      }
      if (wide && !fullScanOk(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries scanning >8 columns (add justification or prune): $offenders")
  }

  test("every catalog query plans without error on sf0.001") {
    planned.foreach { case (name, fn) =>
      val qe = fn(spark, sf0001).queryExecution
      assert(qe.executedPlan != null, name)
    }
  }
}
