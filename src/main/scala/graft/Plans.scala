package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit dump: `.explain("formatted")` for the headline queries, plus
  * automated checks of the properties each plan must have at scale
  * (pushdown reaching the scan, broadcast on small dims, no nested-loop
  * joins anywhere). Output: PLANS.md at the repo root.
  *
  *   sbt "runMain graft.Plans [sfDir] [outFile]"
  */
object Plans {

  private case class Audit(query: String, why: String,
      mustContain: Seq[String] = Nil, mustNotContain: Seq[String] = Nil)

  private val audits = Seq(
    Audit("q02_global_agg", "global no-group aggregate: one partial+final pass, no join, no window",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join", "Window")),
    Audit("q03_mode", "mode: group-count + top-1 via TakeOrdered — no global sort, no join",
      mustContain = Seq("HashAggregate", "TakeOrderedAndProject"), mustNotContain = Seq("Join")),
    Audit("q04_topk", "top-k by metric: aggregate + TakeOrdered — the limit prunes the sort, no join",
      mustContain = Seq("HashAggregate", "TakeOrderedAndProject"), mustNotContain = Seq("Join")),
    Audit("q05_date_split", "timestamp parse/split: pure per-row projection — no join, no aggregate, no window",
      mustNotContain = Seq("Join", "HashAggregate", "Window")),
    Audit("q07_distinct", "distinct: partial+final hash aggregate, no join",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join")),
    Audit("q08_union", "union: physical Union of scans — no join, no dedup pass (UNION ALL semantics)",
      mustContain = Seq("Union"), mustNotContain = Seq("Join")),
    Audit("q09_impute_mode", "mode imputation: the mode is a 1-ROW TakeOrdered aggregate broadcast onto every row (the q61/q91 scalar-broadcast pattern — no driver-side mode job); no cartesian of real tables",
      mustContain = Seq("TakeOrderedAndProject", "BroadcastExchange"),
      mustNotContain = Seq("CartesianProduct")),
    Audit("q11_join_fact", "fact-fact join: equi-keys only, no nested loop",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q12_semi_join", "semi join: physical Semi join variant, never a full join + distinct",
      mustContain = Seq("Semi"), mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q13_anti_join", "anti join: physical Anti join variant, never a full join + filter",
      mustContain = Seq("Anti"), mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q14_outer_join", "outer join: equi-keys only, no nested loop",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q18_rollup", "rollup: ONE aggregate pass over Expand-generated grouping sets — no self-union of scans",
      mustContain = Seq("Expand"), mustNotContain = Seq("Join", "Union")),
    Audit("q19_text_stats", "per-doc text stats: pure per-row projection — no join, no window",
      mustNotContain = Seq("Join", "Window")),
    Audit("q22_quality_score", "quality score: per-row codegen'd heuristics — no join, no window",
      mustNotContain = Seq("Join", "Window")),
    Audit("q24_ann_cosine", "exact ANN baseline: native vec_dot scoring, bounded query sliver broadcast (the only nested loop is the deliberate non-equi broadcast of <= 5 query rows)",
      mustContain = Seq("vec_dot"), mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    Audit("q28_json_extract", "JSON extraction: per-row get_json_object projection — no join, no aggregate",
      mustNotContain = Seq("Join", "HashAggregate")),
    Audit("q30_simhash", "SimHash pairs: native one-pass simhash32 fingerprints, byte-band equi-join candidates — no nested loop, no cartesian",
      mustContain = Seq("simhash32"), mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q31_langid", "language id: literal-replace occurrence counting per row — no join, no aggregate",
      mustNotContain = Seq("Join", "HashAggregate")),
    Audit("q32_token_count", "token counting: per-row regex segmentation — no join, no aggregate",
      mustNotContain = Seq("Join", "HashAggregate")),
    Audit("q33_fingerprint", "rolling fingerprint: native one-pass rolling_fingerprint per row + fp-partitioned dup-count window — no join",
      mustContain = Seq("rolling_fingerprint", "Window"), mustNotContain = Seq("Join")),
    Audit("q35_embed_neardup", "embedding near-dup: native LSH bucket keys for candidates, native vec_dot verify — equi-join only",
      mustContain = Seq("vec_dot"), mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q36_cube", "cube: ONE aggregate pass over Expand — no self-union of scans",
      mustContain = Seq("Expand"), mustNotContain = Seq("Join", "Union")),
    Audit("q37_pivot", "pivot: static value list folds into one aggregate — no distinct pre-pass job, no join",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join")),
    Audit("q42_approx_distinct", "HLL++ distinct: mergeable sketch aggregate — no count-distinct Expand explosion",
      mustNotContain = Seq("Expand", "Join")),
    Audit("q46_grouping_sets", "grouping sets: ONE aggregate pass over Expand — no self-union of scans",
      mustContain = Seq("Expand"), mustNotContain = Seq("Join", "Union")),
    Audit("q50_datetime_funcs", "datetime breadth: per-row codegen'd projection — no join, no window",
      mustNotContain = Seq("Join", "Window")),
    Audit("q51_profile", "column profiling: one aggregation pass — no nested loop, no cartesian",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q52_unpivot", "unpivot: native Expand over the value columns — never a per-column union of scans",
      mustContain = Seq("Expand"), mustNotContain = Seq("Union", "Join")),
    Audit("q54_array_agg", "collection aggregates: collect_set/list ride the object hash aggregate — no join",
      mustContain = Seq("ObjectHashAggregate"), mustNotContain = Seq("Join")),
    Audit("q55_split_sample", "hash split: md5-bucket assignment map-side + one aggregate — no join, no sampling pass",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join")),
    Audit("q56_intersect_except", "set ops: semi/anti join forms with partial dedup — no cartesian",
      mustNotContain = Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    Audit("q57_null_funcs", "null handling: per-row builtins — no join, no aggregate",
      mustNotContain = Seq("Join", "HashAggregate")),
    Audit("q59_filtered_agg", "FILTER-clause aggregates: one conditional aggregate pass — no join, no self-union",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join", "Union")),
    Audit("q01_group_agg", "partial+final hash aggregate; scan prunes to 3 columns",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("SortAggregate")),
    Audit("q06_filter_project", "filter + projection PUSHED to the parquet scan",
      mustContain = Seq("PushedFilters: [IsNotNull"), mustNotContain = Nil),
    Audit("q10_join_star", "dims broadcast: no shuffle of the fact side for the joins",
      mustContain = Seq("BroadcastHashJoin"), mustNotContain = Seq("BroadcastNestedLoopJoin")),
    Audit("q15_window_rank", "top-3-per-key rank: window partitioned by o_custkey — one shuffle, never a single global window partition, no join",
      mustContain = Seq("Window"), mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q16_window_running", "running sum: window partitioned per user — bounded partitions, no join",
      mustContain = Seq("Window"), mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q17_window_lag", "lag/delta: per-user window, no join, no global partition",
      mustContain = Seq("Window"), mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q20_dedup_exact", "dedup groups on sha2 digest, never raw text bytes",
      mustContain = Seq("sha2"), mustNotContain = Nil),
    Audit("q21_word_topk", "word top-k: explode + ONE partial+final hash aggregate, top-k via TakeOrdered — no join, no global sort of the vocabulary",
      mustContain = Seq("Generate", "HashAggregate", "TakeOrderedAndProject"),
      mustNotContain = Seq("Join")),
    Audit("q23_ngram_jaccard", "inverted-index equi-join; no all-pairs nested loop",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q25_minhash_lsh", "LSH band equi-join on (band, hash) keys (hash join; broadcast at small SF, shuffle at scale)",
      mustContain = Seq("HashJoin"), mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q26_tumbling_window", "tumbling windows in batch: date_trunc keys into ONE partial+final hash aggregate — no window operator, no join",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join", "Window")),
    Audit("q27_sessionize", "sessionization: per-user lag + running session ids — windows partitioned by user_id, never global; no join",
      mustContain = Seq("Window"), mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q29_ann_lsh", "bucketed ANN: equi-join on (table, bucket)",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q34_binary_meta", "multimodal metadata: per-partition codec pass over binary payloads — payload never joins or shuffles by content",
      mustNotContain = Seq("Join", "CartesianProduct")),
    Audit("q38_asof_join", "as-of via union + running last(): single shuffle, zero joins",
      mustNotContain = Seq("Join")),
    Audit("q39_range_join", "range predicate as (key, time-bucket) equi-join",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q40_percentile", "exact grouped percentiles: ONE TypedImperativeAggregate buffer per group (array of ps), partial+merge object hash aggregate — no join, no per-group sort job",
      mustContain = Seq("ObjectHashAggregate"), mustNotContain = Seq("Join")),
    Audit("q41_stats", "corr/covar/stddev: declarative one-pass hash aggregate — no join, no second scan",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join")),
    Audit("q43_session_window", "native session windows in batch: session_window keys into an aggregate — no join, no cartesian",
      mustNotContain = Seq("Join", "CartesianProduct")),
    Audit("q44_ann_ivf", "IVF: map-side centroid argmax, equi-join only on list_id",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q47_range_frame", "event-time RANGE frame on integer micros, window partitioned per user — no join, never a single global window partition",
      mustContain = Seq("Window"),
      mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q62_resample", "gap-fill resample: per-user hour spine via sequence+explode (no driver calendar, no global-spine cross join); spine joins the agg on (user_id, h) equi-keys",
      mustContain = Seq("Generate"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q63_sliding_window", "sliding windows: each event explodes to exactly its 2 covering windows (bounded Generate), then ONE partial+final hash aggregate — no join, no self-union of scans",
      mustContain = Seq("Generate", "HashAggregate"),
      mustNotContain = Seq("Join", "CartesianProduct")),
    Audit("q45_corpus_filter", "corpus pipeline: one digest shuffle, no joins at all",
      mustContain = Seq("sha2"), mustNotContain = Seq("Join")),
    Audit("q48_window_dist", "distribution functions: per-custkey windows, never a single global partition; no join",
      mustContain = Seq("Window"), mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q49_string_funcs", "string-function breadth: pure per-row codegen'd projection — no join, no aggregate, no window",
      mustNotContain = Seq("Join", "HashAggregate", "Window")),
    Audit("q53_sql_tpch_q1", "SQL front-end TPC-H Q1: the shipdate filter is PUSHED to the parquet scan, one partial+final hash aggregate",
      mustContain = Seq("HashAggregate", "PushedFilters: [IsNotNull"),
      mustNotContain = Seq("Join")),
    Audit("q58_histogram", "equi-width histogram: bucket arithmetic map-side into ONE hash aggregate — no join",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join")),
    Audit("q60_cooccurrence", "vocabulary pruned via broadcast top-50 before the self-join",
      mustContain = Seq("BroadcastHashJoin"), mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q61_tfidf", "TF-IDF: tf/df via equi-joins; the ONE BroadcastNestedLoopJoin is the intended 1-ROW scalar broadcast (corpus size attached to every score row — no driver-side count job); no cartesian of real tables",
      mustContain = Seq("IdentityBroadcastMode"),
      mustNotContain = Seq("CartesianProduct")),
    Audit("q64_dedup_clusters", "embedding dup clusters: LSH bucket pairs -> CC — equi-joins only at every step",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q65_share", "ratio-to-report: frameless windowed sum broadcast back to rows — one window, no join",
      mustContain = Seq("Window"), mustNotContain = Seq("Join")),
    Audit("q66_dedup_keep", "keeper election: groups on the sha2 digest (text never a key), one digest window — no join",
      mustContain = Seq("sha2", "Window"), mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q67_approx_percentile", "mergeable GK sketch: partial+final object hash aggregate, no per-group value buffering in one reducer",
      mustContain = Seq("ObjectHashAggregate"), mustNotContain = Seq("Expand")),
    Audit("q68_dedup_clusters_full", "full-corpus dedup: band-min edges + CC, linear candidate cost; no nested-loop/cartesian anywhere",
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q69_repeated_spans", "intra-doc spans: map-side window generation + ONE (doc_id, span) hash aggregate — no join in the plan",
      mustContain = Seq("HashAggregate"), mustNotContain = Seq("Join", "Expand")),
    Audit("q70_pack_sequences", "packing: one running-sum window per md5 shard; no join, no nested loop",
      mustContain = Seq("Window"), mustNotContain = Seq("Join", "CartesianProduct")),
    Audit("q71_decontaminate", "decontamination: held-out gram set BROADCAST; aggregate keyed by doc_id",
      mustContain = Seq("BroadcastHashJoin"), mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin")),
    Audit("q72_mix_sample", "mixture sample: pure map-side hash filter — no join, no aggregate, no shuffle before the output sort",
      mustNotContain = Seq("Join", "HashAggregate", "Window")),
    Audit("q73_pii_scrub", "PII scrub: pure narrow regex projection — no join, no aggregate, no window; only the output sort shuffles",
      mustNotContain = Seq("Join", "HashAggregate", "Window")),
    Audit("q74_repetition", "repetition metrics: (doc_id, term)-keyed hash aggregates with partial combine; stats join keyed on doc_id only",
      mustContain = Seq("HashAggregate", "partial_count"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q75_curriculum", "curriculum: literal stage bounds (no global sort of the data), position window partitioned by (stage, shard) — never a single-partition window",
      mustContain = Seq("Window"),
      mustNotContain = Seq("Join", "SinglePartition")),
    Audit("q76_bloom_decontaminate", "bloom decontamination: codegen'd might_contain prefilter on the probe side; exact verify joins only the bloom-positive sliver",
      mustContain = Seq("might_contain", "BroadcastHashJoin"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin")),
    Audit("q77_freq_quality", "frequency quality: token-keyed vocab agg with partial combine, top-V broadcast to the probe join, doc_id-keyed final agg",
      mustContain = Seq("BroadcastHashJoin", "partial_count"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    Audit("q78_incremental_neardup", "incremental near-dup: crawl-sized delta band keys BROADCAST over the base — base never shuffles for the probe; no nested loop anywhere",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q79_budget_sample", "token-budget sampling: per-lang totals broadcast, integer bucket threshold map-side — no window, no ordered prefix scan",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("Window", "SortMergeJoin", "CartesianProduct")),
    Audit("q80_stratified_topk", "stratified top-k: phase-1 window partitioned by (lang, shard) — bounded slices, never one task per stratum over the corpus; no join anywhere",
      mustContain = Seq("Window"),
      mustNotContain = Seq("Join", "SinglePartition", "CartesianProduct")),
    Audit("q81_compress_ratio", "compression ratio: pure map-side deflate pass — no join, no aggregate, no window; only the output sort shuffles",
      mustNotContain = Seq("Join", "HashAggregate", "Window")),
    Audit("q82_ann_quantized", "quantized ANN: native vec_quantize_i8/vec_dot_i8 in the projection, bounded query sliver broadcast (the q24 brute-force shape on 4×-smaller vectors); no shuffle join of the corpus",
      mustContain = Seq("vec_dot_i8"),
      mustNotContain = Seq("SortMergeJoin", "CartesianProduct")),
    Audit("q83_topk_sketch", "sketched exact top-k: the sketch + guarded recount execute IN-OPERATOR (bounded shuffle, <= capacity keys/partition); the returned frame is the verified k rows as a LOCAL relation — the caller's action must NOT re-scan the corpus",
      mustContain = Seq("LocalTableScan"),
      mustNotContain = Seq("Join", "CartesianProduct", "Scan parquet")),
    Audit("q84_crossdoc_spans", "cross-doc span dedup: map-side span Generate, ownership via ONE min/max aggregate WITH map-side partials (a boilerplate span cannot hot-key a reducer), AQE-splittable equi-join back — never a window over a global span key",
      mustContain = Seq("Generate", "partial_min"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q85_full_pipeline", "composed pipeline: keeper output MATERIALIZED (every gate branch reads the cache, text scanned once); gate joins keyed on doc_id, budget totals broadcast, packing window (shard)-bounded",
      mustContain = Seq("InMemoryTableScan", "Window"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q86_domain_cap", "per-domain caps: q80's two-phase exact top-k keyed on source — phase-1 windows (source, shard)-bounded, no domain ever sorts in one task; no join anywhere",
      mustContain = Seq("Window"),
      mustNotContain = Seq("Join", "SinglePartition", "CartesianProduct")),
    Audit("q87_domain_budget", "per-domain token budget: q79's machinery keyed on source — per-source totals broadcast back, map-side integer keep test; no window, no ordered prefix scan",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("Window", "SortMergeJoin", "CartesianProduct")),
    Audit("q88_strip_spans", "boilerplate strip: q84 cut list → (doc_id, idx) anti-join against the token stream (doc_id in every join key), in-row array_sort reassembly — no global sort of tokens, no nested loop",
      mustContain = Seq("Generate", "partial_min"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q89_containment", "containment: TWO-SIDED positional prefix filter (PPJoin — probe indexes its k rarest tokens, container postings die inside the equi-join unless the witness sits within the container's own prefix rank), exact verify on token arrays; hotPostingMax guard available for degenerate vocabularies (df-capped witnesses, loss bound documented) — no all-pairs nested loop, no cartesian",
      mustContain = Seq("Window"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q90_lm_surprisal", "LM surprisal: term-keyed count aggregates with map-side partials, model equi-joins, per-row quantization to exact longs BEFORE the doc_id-keyed sum (no float crosses a shuffle); V rides the 1-row broadcast",
      mustContain = Seq("HashAggregate", "IdentityBroadcastMode"),
      mustNotContain = Seq("CartesianProduct")),
    Audit("q91_corpus_card", "corpus card: TWO scans (doc-level + token-level aggregates) joined as 1-row broadcasts; count-distincts ride Expand (report query, not hot path — q42's HLL++ is the at-scale swap)",
      mustContain = Seq("Expand", "IdentityBroadcastMode"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin")),
    Audit("q92_fuzzy_decontam", "fuzzy decontamination: held-doc postings BROADCAST (benchmark-sized), corpus grams probe map-side, pair-keyed count agg with map-side partials — gram text shuffles once (the per-doc distinct), never into a join",
      mustContain = Seq("BroadcastHashJoin"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q93_det_shuffle", "deterministic epoch shuffle: md5 order computed map-side, position window (shard)-bounded — never a single global window partition, no join",
      mustContain = Seq("Window"),
      mustNotContain = Seq("Join", "SinglePartition", "CartesianProduct")),
    Audit("q94_semdedup", "SemDeDup: map-side centroid argmax assignment (native vec_dot), within-cell pairs via equi-join on list_id only, CC equi-joins — no all-pairs nested loop, no cartesian",
      mustContain = Seq("vec_dot"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q95_importance_weights", "DSIR weights: token-keyed count aggregates with map-side partials, target model + totals broadcast (the 1-row IdentityBroadcastMode pattern), per-row quantization to exact longs before the doc_id-keyed sum",
      mustContain = Seq("HashAggregate", "IdentityBroadcastMode"),
      mustNotContain = Seq("CartesianProduct")),
    Audit("q96_nb_classifier", "NB classifier: (label, token)-keyed training aggregates with map-side partials, vocabulary-sized score grid BROADCAST to the token stream, doc_id-keyed sums, argmax window per doc — the label-count crossJoins are the deliberate tiny IdentityBroadcastMode pattern, no cartesian of real tables",
      mustContain = Seq("BroadcastHashJoin", "Window"),
      mustNotContain = Seq("CartesianProduct")),
    Audit("q97_edit_distance", "edit-distance pairs: PassJoin segments/probes generated MAP-SIDE (transform/sequence over the row's own text), candidate equi-join on xxhash64(L, slot, segment) so no substring text shuffles, bounded-DP levenshtein verify on candidates only — no all-pairs nested loop, no cartesian",
      mustContain = Seq("levenshtein", "xxhash64"),
      mustNotContain = Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    Audit("q98_incremental_semdedup", "incremental SemDeDup: delta assigned map-side against base-trained centroid literals (native vec_dot argmax) and BROADCAST to the base side, which never shuffles for the probe — no cartesian, no sort-merge on the probe path",
      mustContain = Seq("BroadcastHashJoin", "vec_dot"),
      mustNotContain = Seq("CartesianProduct", "SortMergeJoin", "BroadcastNestedLoopJoin")),
    Audit("q99_subword_tokens", "subword token count: vocabulary is one gram aggregate + bounded top-V collect shipped as a plan literal (the centroid pattern); counting is a per-row native bpe_token_count map — no join, no window in the count path",
      mustContain = Seq("bpe_token_count"),
      mustNotContain = Seq("Join", "Window")))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.drop(1).headOption.getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit (generated by `graft.Plans`)\n\n")
    sb.append(s"Source: `$sfDir`. Each section: the scale property the plan must\n")
    sb.append("hold, the automated check result, then `explain(\"formatted\")`.\n")
    var failures = 0
    audits.foreach { a =>
      val df = SparkEntry.queries(a.query)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val missing = a.mustContain.filterNot(formatted.contains)
      val present = a.mustNotContain.filter(formatted.contains)
      val ok = missing.isEmpty && present.isEmpty
      if (!ok) failures += 1
      sb.append(s"\n## ${a.query}\n\n")
      sb.append(s"Property: ${a.why}\n\n")
      sb.append(s"Check: ${if (ok) "PASS" else
        s"FAIL (missing=${missing.mkString(",")} forbidden=${present.mkString(",")})"}\n\n")
      sb.append("```\n").append(formatted.trim).append("\n```\n")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"PLANS: ${audits.size - failures}/${audits.size} checks pass -> $outFile")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
