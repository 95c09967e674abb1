"""Query registry — the single source of truth for the engine's query
surface.

Every entry pairs a Spark DataFrame pipeline with (where SQL-expressible) an
independent DuckDB oracle. ``__spark_entry__.py`` re-exports these as
``queries()`` / ``oracle_sql()`` for the driver's differential gate;
``tests/test_correctness.py`` runs the same comparison locally.

``tags`` cite the SURVEY.md §2 operator ids each query exercises, so coverage
is auditable line-by-line.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import documents as D
from . import access_q as AC
from . import events as E
from . import multimodal_q as M
from . import ops_q as O
from . import pipeline as PL
from . import graph_q as G
from . import interval_q as IV
from . import relational as R
from . import timeseries_q as TS
from . import vectors_q as V

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_SPECS: list[QuerySpec] = [
    # ------------------------------------------------------------------
    # ORDERING CONTRACT: the external driver gates only the FIRST 50
    # entries. The first 50 below are a minimum set cover of every
    # SURVEY.md §2 operator id (plus DD/VS/TX/MM/CRYPTO pipeline ids),
    # so each id gets at least one externally-checked gate per round.
    # The remaining entries add depth on already-covered ids and are
    # still oracle-checked locally by tests/test_correctness.py.
    # tests/test_registry_cover.py asserts this invariant.
    # ------------------------------------------------------------------
    QuerySpec("pricing_summary", R.pricing_summary, R.PRICING_SUMMARY_SQL,
              ("A1", "A2", "P1", "P2"), "TPC-H Q1 shape: wide hash agg"),
    # r9 rotation (r8 verdict task 3): strict-superset swap — the
    # relational-shapes suite EXECUTES regional_supplier_volume verbatim
    # (its q5_volume path) and adds the two never-in-window TPC-H shapes;
    # the displaced entry stays oracle-checked in the tail.
    QuerySpec("relational_shapes_suite", R.relational_shapes_suite,
              R._bind_relational_suite_sql(),
              ("J1", "J5", "A1", "J8", "A9", "T1", "J9", "BONUS"),
              "fused relational-shape audit: EXECUTES the Q5 6-way "
              "broadcast-dim join+agg, the Q21 EXISTS/NOT-EXISTS "
              "quantifier rewrite, the Q13 zero-inclusive custdist "
              "histogram, and (r9) the CUBE grouping sets + "
              "explicit-value PIVOT reshaping surfaces verbatim, "
              "labeled; dsum revenue integerizes via identical IEEE "
              "FLOOR(x*10000+0.5)"),
    # r7 rotation (verdict task 7): the interval family's in-window slot.
    # returns_conditional moved to the tail — its tags stay covered
    # (A2: pricing_summary/user_type_winloss/category_leaderboard,
    # P4: docs_sketch_suite, P5: part_price_fallback).
    QuerySpec("supplier_shipment_overlap", IV.supplier_shipment_overlap,
              IV.SUPPLIER_SHIPMENT_OVERLAP_SQL, ("J6", "W2", "BONUS"),
              "interval-overlap self-join via week-bucket candidate "
              "expansion + exact filter + pair dedup (the scale path) vs "
              "the oracle's direct quadratic predicate join — proves "
              "bucketization lossless; peak concurrency by sweep line "
              "with per-date pre-aggregated deltas"),
    QuerySpec("part_price_fallback", R.part_price_fallback,
              R.PART_PRICE_FALLBACK_SQL, ("J9", "P5"),
              "left-join fallback ladder with coalesce"),
    QuerySpec("candles_5m_rebucketed", E.candles_5m_rebucketed, E.CANDLES_5M_SQL,
              ("A8", "A7"), "partial-state re-bucketing 1m→5m"),
    QuerySpec("market_overview", E.market_overview, E.MARKET_OVERVIEW_SQL,
              ("J2", "A1", "A4"), "3-way left join: volume x last price x users"),
    QuerySpec("user_stats", E.user_stats, E.USER_STATS_SQL,
              ("A1", "A3", "A4", "A5"), "per-user profile agg"),
    # r8 rotation (verdict task 3): the deletion-gap-correct PIT/SCD2
    # temporal join takes the as-of family's window slot;
    # last_view_before_purchase moved to the tail — J6 stays covered here
    # and by supplier_shipment_overlap.
    QuerySpec("lineitem_pit_scd2_lookup", O.lineitem_pit_scd2_lookup,
              O.LINEITEM_PIT_SCD2_LOOKUP_SQL, ("J6", "W1", "BONUS"),
              "point-in-time join against SCD2 history (the temporal "
              "dimension lookup of every warehouse fact load): equi-join "
              "+ interval post-filter with version-count-bounded fanout "
              "vs DuckDB's native ASOF JOIN — agreement proves the SCD2 "
              "islands tile the version axis"),
    QuerySpec("hour_bucket_last", E.hour_bucket_last, E.HOUR_BUCKET_LAST_SQL,
              ("W5", "A4"), "last value per time bucket"),
    QuerySpec("user_type_winloss", E.user_type_winloss,
              E.USER_TYPE_WINLOSS_SQL, ("A13", "A2", "W4"),
              "two-level win/loss/best/worst fold"),
    QuerySpec("domain_ledger_summary", E.domain_ledger_summary,
              E.DOMAIN_LEDGER_SUMMARY_SQL, ("O1", "O2", "O7"),
              "full domain FIFO ledger replay → oracle-checked cashflow "
              "projections + conservation identity"),
    QuerySpec("category_leaderboard", E.category_leaderboard,
              E.CATEGORY_LEADERBOARD_SQL,
              ("J1", "J3", "W1", "A2", "A3", "A9", "T1"),
              "SCD2 category-filtered leaderboard: LEAD intervals + "
              "broadcast range join vs ASOF-JOIN oracle"),
    QuerySpec("streaming_candles_1m", E.streaming_candles_1m,
              E.STREAMING_CANDLES_1M_SQL, ("ST1", "ST2", "ST3", "A7"),
              "foreachBatch incremental candle fold over 4 interleaved "
              "microbatches == direct batch aggregation"),
    QuerySpec("fifo_pnl_modes_unrealized", E.fifo_pnl_modes_unrealized,
              E.FIFO_PNL_MODES_UNREALIZED_SQL, ("O3", "O1"),
              "PnL modes 1-4: realized period filters PLUS the open-lot "
              "unrealized mark at period end (mode 3 = in-period lots, "
              "mode 4 = all open lots) vs interval-overlap oracle"),
    QuerySpec("fifo_daily_rollup", E.fifo_daily_rollup,
              E.FIFO_DAILY_ROLLUP_SQL, ("O4", "O1"),
              "wallet x exit-day realized rollup from the FIFO pair "
              "decomposition vs day-regrouped interval oracle"),
    QuerySpec("user_signed_balances", E.user_signed_balances,
              E.USER_SIGNED_BALANCES_SQL, ("A10", "A11", "U1", "U2"),
              "dedup-first signed heterogeneous union -> per-user balance "
              "(SummingMergeTree shape)"),
    QuerySpec("merged_timeline_page", E.merged_timeline_page,
              E.MERGED_TIMELINE_PAGE_SQL, ("T4", "U2", "T2", "T3"),
              "heterogeneous union merged into one total order, paginated "
              "via TakeOrdered (unified activity feed)"),
    # r8 rotation (verdict task 2): the fused segmentation suite gives the
    # r7 rfm/ltv/pareto families their first in-window row from one slot;
    # docs_dedup_keep_best moved to the tail — DD1 stays covered by
    # docs_curation_pipeline, docs_chunk_dedup_rewrite and frame_dedup,
    # A4 by market_overview/user_stats/hour_bucket_last.
    QuerySpec("user_segmentation_suite", TS.user_segmentation_suite,
              TS.USER_SEGMENTATION_SUITE_SQL,
              ("A1", "A2", "T1", "W2", "BONUS"),
              "fused per-user analytics gate: rfm cube + cohort LTV + "
              "Pareto concentration + max drawdown + multi-touch "
              "attribution + exact Gini executed verbatim via their "
              "frame cores from ONE persisted corpus scan and ONE "
              "shared per-user RFM subtree (labeled family/k/metric/"
              "value rows, exact-as-STRING values incl. the Gini "
              "DECIMAL(38,0) abs-diff sum)"),
    QuerySpec("docs_profile", D.docs_profile, D.DOCS_PROFILE_SQL,
              ("TX1", "TX2", "TX3", "TX4"),
              "fused per-document analysis pass: quality stats + lang-id + "
              "token counts + rolling fingerprint in ONE scan (the r5 "
              "gate-window rotation: the three component gates moved past "
              "the cutoff, freeing slots for never-gated entries); r6 "
              "strict-superset growth: EXECUTES docs_bigram_surprisal "
              "(TX1+++ bigram-LM conditional surprisal) via a doc_id left "
              "join, giving the corpus-LM signal an in-window check; r15: "
              "EXECUTES the docs_k_anonymity core via a broadcast QI join "
              "— each doc annotated with its group's anon_level and "
              "l_distinct (TX10b in-window from day one)"),
    # r7 rotation: strict-superset swap — the series suite EXECUTES
    # props_bucket_agg's logic verbatim as its 'props' path (the §2.8
    # JSON evidence keeps its external check) and adds the four r7
    # series families (order-statistic selection, median/MAD outliers,
    # autocovariance, forecast backtest) to the window in one slot.
    # props_bucket_agg stays oracle-checked in the tail.
    QuerySpec("events_series_suite", TS.events_series_suite,
              TS.EVENTS_SERIES_SUITE_SQL,
              ("A1", "A3", "A7", "W2", "W4", "P5", "BONUS"),
              "fused robust-series audit: EXECUTES quantile selection, "
              "median/MAD outliers, lag-1h/24h autocovariance, forecast "
              "backtesting, the q-digest sketch build with its full "
              "rank-error audit, the displaced props_bucket_agg JSON "
              "path, and (r8) cusum alarms, counter-reset deltaSum, "
              "seasonal-residual outliers, the q-digest -State/-Merge "
              "bound audit, winsorized/trimmed robust means, and (r9) "
              "the month-half distribution-drift monitor, the A/B-arm "
              "sufficient statistics, cross-type lead-lag correlation, "
              "the Markov transition fit, the integer EWMA control "
              "chart, and the day-bitmap -Merge tier — all "
              "from shared persisted cents/hourly subtrees; "
              "all-STRING value column keeps "
              "DECIMAL(38,0) covariances exact"),
    QuerySpec("wallet_snapshot_positions", E.wallet_snapshot_positions,
              E.WALLET_SNAPSHOT_POSITIONS_SQL, ("O2", "O1", "ST6"),
              "snapshot emitter over an integer-quantity domain vs "
              "Lindley-recursion + ASOF-boundary oracle (rotated into the "
              "gate window in r5)"),
    QuerySpec("docs_sketch_suite", D.docs_sketch_suite,
              D.DOCS_SKETCH_SUITE_SQL, ("A3", "P4", "BONUS"),
              "fused sketch-family gate (r6 rotation into the slot freed "
              "by folding dup-clusters into the pair audit): EXECUTES the "
              "CMS frequency sketch, the propose/verify heavy-hitter "
              "pipeline, the KMV bottom-k distinct sketch with its "
              "lossless merge, and (r8) the from-scratch HLL register "
              "histogram, and (r15) the Bloom-filter register state + "
              "probe audit — the whole uniqCombined-analog family gets "
              "an external check in one slot; components stay "
              "oracle-checked in the tail"),
    QuerySpec("docs_pair_recall_audit", D.docs_pair_recall_audit,
              D.DOCS_PAIR_RECALL_AUDIT_SQL, ("DD2", "DD4", "DD6"),
              "fused near-dup audit: EXECUTES docs_jaccard_pairs (LSH "
              "candidates + exact shingle-Jaccard verify), docs_setsim_join "
              "(PPJoin prefix filter vs full-inverted-index oracle — the "
              "100%-recall proof), docs_dup_clusters' connected "
              "components (label propagation vs recursive-CTE closure), "
              "AND docs_containment_pairs (asymmetric subset-dup verify, "
              "max-direction containment as exact ppm/1e6), AND "
              "docs_bands_incremental (append-vs-rebuild band-table MV "
              "maintenance — r7), AND docs_hybrid_near_dup (DD3 "
              "embedding-cosine verify over the same candidates — r7), "
              "labeled by path; one persisted candidate subtree feeds "
              "every verify path (all displaced/absorbed entries stay "
              "oracle-checked in the tail)"),
    # r9 rotation (r8 verdict task 3): strict-superset swap — the
    # tokenizer suite EXECUTES docs_simhash verbatim and brings the two
    # never-in-window tokenizer families (Heaps'-law vocab growth, BPE
    # held-out OOV/coverage) into the window; docs_simhash stays
    # oracle-checked in the tail.
    QuerySpec("docs_tokenizer_suite", PL.docs_tokenizer_suite,
              PL._docs_tokenizer_suite_sql(),
              ("DD5", "TX1", "TX3", "W2", "A1", "BONUS"),
              "fused tokenizer-arc audit: EXECUTES the 16-bit SimHash "
              "signatures, the Heaps'-law vocabulary-growth curve "
              "(VG_BUCKETS-bounded windows), the BPE held-out "
              "vocab-coverage capstone (train on 4/5, profile the held "
              "fifth: OOV/merged ppm, bytes-per-token), and the "
              "Good-Turing count-of-counts spectrum — four paths "
              "overlapped via a thread pool, values BIGINT-as-STRING"),
    QuerySpec("docs_word_filter_top", D.docs_word_filter_top,
              D.DOCS_WORD_FILTER_TOP_SQL, ("J4", "A6"),
              "FUSED J4→A6: array-membership semi-join filter feeding the "
              "groupArray+arraySort+arrayMap ordered collection (gate-window "
              "fusion — standalone forms stay past the cutoff)"),
    QuerySpec("docs_sample_pack", D.docs_sample_pack,
              D.DOCS_SAMPLE_PACK_SQL, ("TX5", "TX6"),
              "FUSED TX5→TX6: hash-stratified per-source sample feeding "
              "context-window sequence packing — any sampling divergence "
              "shifts every bin boundary"),
    QuerySpec("docs_curation_pipeline", PL.docs_curation_pipeline,
              PL.DOCS_CURATION_PIPELINE_SQL,
              ("TX1", "TX7", "DD1", "J8", "BONUS"),
              "the WHOLE curation pass as one declarative DAG: eval-drop → "
              "quality → exact-dedup → decontamination → per-source "
              "accounting (stages share their standalone gates' logic)"),
    QuerySpec("semdedup_prune", V.semdedup_prune, V.SEMDEDUP_PRUNE_SQL,
              ("DD3", "VS4", "BONUS"),
              "semantic deduplication (SemDeDup shape): coarse-quantizer "
              "cluster assignment bounds the near-dup pair join to "
              "within-cluster pairs (n²/k); prune = lower-id cluster-mate "
              "with cosine ≥ τ"),
    QuerySpec("docs_chunk_dedup_rewrite", D.docs_chunk_dedup_rewrite,
              D.DOCS_CHUNK_DEDUP_REWRITE_SQL, ("DD1", "W2", "BONUS"),
              "C4/RefinedWeb duplicate-chunk removal with document "
              "REASSEMBLY: keep-first over corpus-wide 8-word chunks "
              "(md5-keyed winner agg + hash join back + per-doc ordered "
              "reassembly) vs the oracle's raw-text ROW_NUMBER winner — "
              "output is the rewritten corpus, not a report (r7 slot-neutral swap with docs_dup_ngram_spans: identical DD1/W2 tags; the spans entry stays oracle-checked in the tail)"),
    QuerySpec("docs_tf_keywords", PL.docs_tf_keywords,
              PL.DOCS_TF_KEYWORDS_SQL, ("TX8", "W4", "BONUS"),
              "per-doc keywords by (tf desc, df asc) — integer TF-IDF "
              "ordering, corpus DF broadcast"),
    QuerySpec("leaderboard_parity_audit", O.leaderboard_parity_audit,
              O.LEADERBOARD_PARITY_AUDIT_SQL, ("O6", "W4", "T1"),
              "overlap + rank-delta audit between volume- and count-ranked "
              "leaderboards (reference audit agent)"),
    QuerySpec("tx_group_correlation", O.tx_group_correlation,
              O.TX_GROUP_CORRELATION_SQL, ("J7", "J8"),
              "tx-group flags + skip-set classification vs correlated "
              "EXISTS oracle"),
    QuerySpec("reorg_replay_counts", O.reorg_replay_counts,
              O.REORG_REPLAY_COUNTS_SQL, ("ST2", "S8", "U3", "A11"),
              "hot-tail re-ingest with duplicate ids collapses to "
              "exactly-once aggregates"),
    QuerySpec("sink_round_trip_monthly", O.sink_round_trip_monthly,
              O.SINK_ROUND_TRIP_MONTHLY_SQL, ("S3", "S4"),
              "double partition-replace write + read-back == direct rollup"),
    QuerySpec("decode_round_trip", O.decode_round_trip,
              O.DECODE_ROUND_TRIP_SQL, ("S2", "S1"),
              "JVM-side ABI encode -> production decoder -> aggregate vs "
              "direct-computation oracle"),
    QuerySpec("condition_meta_resolution", O.condition_meta_resolution,
              O.CONDITION_META_RESOLUTION_SQL, ("A12", "A4"),
              "earliest-event metadata via min_by(struct order key) vs "
              "ROW_NUMBER oracle"),
    QuerySpec("watermark_accept_counts", O.watermark_accept_counts,
              O.WATERMARK_ACCEPT_COUNTS_SQL, ("ST5", "W2"),
              "event-time watermark accept/drop rule replayed as a batch "
              "audit"),
    QuerySpec("streaming_state_suite", E.streaming_state_suite,
              E._streaming_state_suite_sql(),
              ("ST6", "ST1", "ST3", "ST4", "A3", "A8"),
              "fused streaming-state gate (r6 rotation; grown late-r7, "
              "r9): EXECUTES all three real applyInPandasWithState "
              "streaming queries — avg-cost positions, the greedy pair "
              "automaton, the q-digest sketch state — AND (r9) the "
              "wallet-leaderboard additive -State stream "
              "(streaming_leaderboard_1h's core, read at the all-time "
              "-Merge grain), the session-window stream, the "
              "stream-stream interval join, and (r15) watermarked "
              "stream dedup (dropDuplicatesWithinWatermark over planted "
              "cross-batch at-least-once deliveries): SEVEN real streams "
              "overlapped in one pool, each over real microbatches, unpivoted long "
              "vs the batch oracles; displaced components stay "
              "oracle-checked in the tail"),
    QuerySpec("rest_sync_incremental", O.rest_sync_incremental,
              O.REST_SYNC_INCREMENTAL_SQL, ("S5", "S6", "W3"),
              "two paginated+checkpointed sync rounds (watermark + "
              "change-detection anti-join) == direct end-state oracle"),
    QuerySpec("reconcile_chain_balances", O.reconcile_chain_balances,
              O.RECONCILE_CHAIN_BALANCES_SQL, ("O5", "S7"),
              "tolerance reconciliation flags exactly the injected "
              "mock-chain discrepancies"),
    QuerySpec("wallet_event_scans", AC.wallet_event_scans,
              AC.WALLET_EVENT_SCANS_SQL, ("S9", "W4"),
              "per-wallet keyset scans inverted into one window pass"),
    QuerySpec("optional_filter_trades", AC.optional_filter_trades,
              AC.OPTIONAL_FILTER_TRADES_SQL, ("P6", "T1"),
              "present-only optional-filter composition, two param sets"),
    QuerySpec("validation_quarantine", AC.validation_quarantine,
              AC.VALIDATION_QUARANTINE_SQL, ("P9",),
              "row validation guards vs injected deterministic corruption"),
    QuerySpec("zorder_scan_skipping", AC.zorder_scan_skipping,
              AC.ZORDER_SCAN_SKIPPING_SQL, ("P8", "P3", "BONUS"),
              "two-dimension data skipping: Z-order bit-interleaved "
              "(user_id, event_type) layout serves a conjunctive predicate "
              "on both dims; differential vs the raw table"),
    QuerySpec("adaptive_window_trades", AC.adaptive_window_trades,
              AC.ADAPTIVE_WINDOW_TRADES_SQL, ("T6", "P7"),
              "adaptive widening window decision for all users in one pass"),
    QuerySpec("token_id_derivation", O.token_id_derivation,
              O.TOKEN_ID_DERIVATION_SQL, ("CRYPTO", "S2"),
              "keccak CTF collection/position-id chain via mapInPandas vs "
              "golden-vector oracle"),
    # r7 rotation: parts_graph_suite takes this slot; the displaced
    # near_dup_embeddings tags stay window-covered (DD3: semdedup_prune,
    # VS1: knn_rank_fusion executes the brute-force scan) and the entry
    # stays oracle-checked in the tail.
    QuerySpec("parts_graph_suite", G.parts_graph_suite,
              G.PARTS_GRAPH_SUITE_SQL, ("J1", "W4", "U3", "BONUS"),
              "fused graph-analytics audit: EXECUTES the degree-ordered "
              "triangle count, the fixed-round 2-core peel, and (r8) "
              "the synchronous-LPA community detection from ONE "
              "persisted support-pruned co-order edge table — three "
              "graph families' external checks in one slot"),
    QuerySpec("knn_rank_fusion", V.knn_rank_fusion, V.KNN_RANK_FUSION_SQL,
              ("VS1", "VS3", "BONUS"),
              "reciprocal-rank fusion of the exact scan and the LSH "
              "index (hybrid search): integer ppb 1/(60+rank) terms "
              "summed after division so both engines agree exactly; "
              "oracle recomposes both retriever SQLs verbatim"),
    QuerySpec("ann_index_audit", V.ann_index_audit, V.ANN_INDEX_AUDIT_SQL,
              ("VS4", "VS2", "VS5"),
              "fused quantization-ANN gate (r6 rotation): EXECUTES knn_ivf "
              "(coarse-quantizer cell probe + exact re-rank) AND "
              "knn_pq_adc (Lloyd codebooks + asymmetric lookup-table "
              "distances) side by side, labeled — VS5's PQ path gets its "
              "first in-window external check; the displaced knn_ivf "
              "stays oracle-checked in the tail; r10 growth: the NSW "
              "graph-ANN adjacency (knn_nsw_graph's frame core, "
              "NN-descent construction) and the SQ8 scalar-quantization "
              "audit (sq8_audit_frame) ride as 4th/5th labeled paths — "
              "both r10 families gated in-window from day one; r12: the "
              "binary-quantization tier (_knn_bq_core, Hamming shortlist "
              "+ exact re-rank) rides as the 6th path, restoring the "
              "doctrine for the r11 compression tiers"),
    QuerySpec("multimodal_frame_dedup", M.multimodal_frame_dedup,
              M.MULTIMODAL_FRAME_DEDUP_SQL, ("MM", "DD1", "BONUS"),
              "cross-media duplicate-frame detection, compound long "
              "gate: 'exact' = executor-side 64-byte frame fan-out + "
              "hash-groupBy on signatures (>= 2 media objects = shared "
              "segment); r12: 'code' = DCT-based 64-bit pHash per image "
              "(fixed-point int64 basis inlined into BOTH engines, "
              "lower-median sign bits, two 32-bit words — the "
              "knn_bq_hamming parity rule) and 'pair' = 4x16-bit "
              "Hamming-banded near-dup pairs at <= PHASH_T, exact "
              "xor+bit_count filter; perceptual property pinned in "
              "tests/test_multimodal_phash.py"),
    # ---- past the driver cutoff: depth on already-covered ids ----
    QuerySpec("shipping_priority", R.shipping_priority, R.SHIPPING_PRIORITY_SQL,
              ("J1", "A1", "T1"), "TPC-H Q3 shape: join + agg + top-k"),
    QuerySpec("late_order_priority", R.late_order_priority,
              R.LATE_ORDER_PRIORITY_SQL, ("J1", "A1", "P7"),
              "TPC-H Q4 shape: EXISTS semi-join"),
    QuerySpec("customers_without_urgent_orders",
              R.customers_without_urgent_orders,
              R.CUSTOMERS_WITHOUT_URGENT_ORDERS_SQL, ("J8", "A1"),
              "anti-join against a qualified skip-set"),
    QuerySpec("segment_top_customers", R.segment_top_customers,
              R.SEGMENT_TOP_CUSTOMERS_SQL, ("W4",), "ranked window top-k per group"),
    QuerySpec("lineitem_page", R.lineitem_page, R.LINEITEM_PAGE_SQL,
              ("T2", "T3"), "deterministic LIMIT/OFFSET pagination"),
    QuerySpec("orders_monthly", R.orders_monthly, R.ORDERS_MONTHLY_SQL,
              ("A1",), "date_trunc month rollup"),
    QuerySpec("party_volume_union", R.party_volume_union,
              R.PARTY_VOLUME_UNION_SQL, ("U1", "W4", "J1"),
              "union-relabel view + per-role top-k (wallet_trades shape)"),
    QuerySpec("cheapest_supplier_per_part", R.cheapest_supplier_per_part,
              R.CHEAPEST_SUPPLIER_PER_PART_SQL, ("J1", "A1", "W4"),
              "TPC-H Q2 shape: per-group min via decorrelated subquery"),
    QuerySpec("regional_rollup", R.regional_rollup, R.REGIONAL_ROLLUP_SQL,
              ("A1", "BONUS"), "ROLLUP grouping sets (beyond reference)"),
    QuerySpec("supplier_share_having", R.supplier_share_having,
              R.SUPPLIER_SHARE_HAVING_SQL, ("A9", "A1"),
              "TPC-H Q11 shape: HAVING vs scalar-subquery threshold in "
              "exact decimal space"),
    QuerySpec("latest_event_per_user", E.latest_event_per_user,
              E.LATEST_EVENT_PER_USER_SQL, ("W3",), "latest-by-key dedup view"),
    QuerySpec("user_running_value", E.user_running_value,
              E.USER_RUNNING_VALUE_SQL, ("W2",), "running cumulative sum"),
    QuerySpec("candles_1m", E.candles_1m, E.CANDLES_1M_SQL,
              ("A7", "A4"), "OHLCV 1m pre-aggregation"),
    QuerySpec("hourly_type_volume", E.hourly_type_volume,
              E.HOURLY_TYPE_VOLUME_SQL, ("A1",), "hourly volume rollup"),
    QuerySpec("top_users_by_volume", E.top_users_by_volume,
              E.TOP_USERS_BY_VOLUME_SQL, ("T1", "W4", "A1"), "leaderboard"),
    QuerySpec("signup_intervals", E.signup_intervals, E.SIGNUP_INTERVALS_SQL,
              ("W1",), "SCD2 lead-window valid_to"),
    QuerySpec("docs_text_stats", D.docs_text_stats, D.DOCS_TEXT_STATS_SQL,
              ("TX1", "TX3"), "token/quality statistics (whitespace token counts)"),
    QuerySpec("docs_lang_id", D.docs_lang_id, D.DOCS_LANG_ID_SQL,
              ("TX2",), "marker-based language ID"),
    QuerySpec("docs_fingerprint", D.docs_fingerprint, D.DOCS_FINGERPRINT_SQL,
              ("TX4",), "rolling-hash document fingerprint"),
    QuerySpec("docs_winnow_fingerprints", D.docs_winnow_fingerprints,
              D.DOCS_WINNOW_FINGERPRINTS_SQL, ("TX4", "DD2", "BONUS"),
              "WINNOWING (MOSS, Schleimer et al. SIGMOD'03): rightmost-"
              "min k-gram hash per w-window — position-robust local "
              "fingerprints with the shared-substring >= w+k-1 "
              "guarantee (pinned in tests/test_winnow.py) and 2/(w+1) "
              "density; gate pins the winnowed table + cross-doc "
              "shared-hash pairs; O(n*w) window-membership expansion "
              "keeps the selection a pure window-function program"),
    QuerySpec("fifo_pnl_modes", E.fifo_pnl_modes, E.FIFO_PNL_MODES_SQL,
              ("O3", "O1"),
              "PnL modes 1-2 (period-only / with-history) over FIFO "
              "slices vs time-filtered interval oracle"),
    QuerySpec("recent_window_activity", E.recent_window_activity,
              E.RECENT_WINDOW_ACTIVITY_SQL, ("P7", "A1"),
              "now()-relative window with injected clock"),
    QuerySpec("fifo_user_pnl", E.fifo_user_pnl, E.FIFO_USER_PNL_SQL,
              ("O1", "O3"), "FIFO-lot allocation (applyInPandas vs interval SQL)"),
    QuerySpec("avgcost_user_positions", E.avgcost_user_positions,
              E.AVGCOST_USER_POSITIONS_SQL, ("O1", "ST6"),
              "sequential avg-cost state machine vs recursive-CTE oracle"),
    QuerySpec("orders_latest_activity", E.orders_latest_activity,
              E.ORDERS_LATEST_ACTIVITY_SQL, ("J3", "W3", "J1"),
              "fact join against latest-by-key dedup subquery "
              "(ReplacingMergeTree FINAL shape)"),
    QuerySpec("docs_token_count_by_source", D.docs_token_count_by_source,
              D.DOCS_TOKEN_COUNT_BY_SOURCE_SQL, ("TX3",), "corpus token accounting"),
    QuerySpec("docs_near_dup_pairs", D.docs_near_dup_pairs,
              D.DOCS_NEAR_DUP_PAIRS_SQL, ("DD2",),
              "MinHash+LSH near-dup candidate pairs"),
    QuerySpec("docs_bpe_token_count", D.docs_bpe_token_count,
              D.DOCS_BPE_TOKEN_COUNT_SQL, ("TX3",),
              "BPE-ish regex tokenization vs whitespace"),
    QuerySpec("docs_quality_filter", PL.docs_quality_filter,
              PL.DOCS_QUALITY_FILTER_SQL, ("TX1", "P5", "BONUS"),
              "Gopher/C4-style quality rules with violation bitmask "
              "(exact rational thresholds, integer-only)"),
    QuerySpec("inventory_invariant", O.inventory_invariant,
              O.INVENTORY_INVARIANT_SQL, ("O7", "W2"),
              "never-negative running inventory check, exact decimal window"),
    QuerySpec("skewed_type_volume", AC.skewed_type_volume,
              AC.SKEWED_TYPE_VOLUME_SQL, ("A1",),
              "salted two-phase hot-key aggregation == plain groupBy oracle"),
    QuerySpec("knn_bruteforce", V.knn_bruteforce, V.KNN_BRUTEFORCE_SQL,
              ("VS1",), "exact cosine top-k"),
    QuerySpec("label_centroids", V.label_centroids, V.LABEL_CENTROIDS_SQL,
              ("VS2",), "per-label centroid (IVF seed)"),
    QuerySpec("knn_ivf", V.knn_ivf, V.KNN_IVF_SQL, ("VS4", "VS2"),
              "IVF ANN: centroid coarse quantizer, nprobe=1, exact re-rank "
              "(standalone form; also runs inside ann_index_audit — "
              "displaced from the gate window by the r6 rotation)"),
    QuerySpec("knn_ivf_nprobe2", V.knn_ivf_nprobe2, V.KNN_IVF_NPROBE2_SQL,
              ("VS4",), "IVF ANN with nprobe=2 (recall/cost knob)"),
    QuerySpec("docs_repetition_signals", PL.docs_repetition_signals,
              PL.DOCS_REPETITION_SIGNALS_SQL, ("TX1", "BONUS"),
              "Gopher-style intra-doc repetition measures (top token/bigram "
              "fraction, distinct-token ratio) — per-row HOFs, shuffle-free"),
    QuerySpec("kmeans_lloyd_step", V.kmeans_lloyd_step,
              V.KMEANS_LLOYD_STEP_SQL, ("VS2", "VS4", "BONUS"),
              "one Lloyd k-means iteration: broadcast seeds, rounded-L2 "
              "argmin assign, (cluster, dim) exact-decimal mean"),
    QuerySpec("kmeans_train", V.kmeans_train, V.KMEANS_TRAIN_SQL,
              ("VS2", "VS4", "BONUS"),
              "3-iteration Lloyd k-means loop (iterative algorithm): each "
              "pass re-broadcasts the rounded centroid state; oracle = the "
              "same recursion unrolled as generated per-iteration CTEs"),
    QuerySpec("docs_hybrid_near_dup", D.docs_hybrid_near_dup,
              D.DOCS_HYBRID_NEAR_DUP_SQL, ("DD2", "DD3", "BONUS"),
              "two-modality fuzzy dedup: LSH text candidates verified by "
              "embedding cosine — propose/dispose, candidates-only join"),
    QuerySpec("user_sessions", E.user_sessions, E.USER_SESSIONS_SQL,
              ("A1", "W1", "ST5", "BONUS"),
              "inactivity-gap sessionization via native session_window vs "
              "gaps-and-islands oracle (lag → flag → running sum → group)"),
    QuerySpec("multimodal_audio_energy", M.multimodal_audio_energy,
              M.MULTIMODAL_AUDIO_ENERGY_SQL, ("MM", "BONUS"),
              "PCM-style windowed energy extraction (audio DSP shape): "
              "integer-exact Arrow kernel fan-out vs char-code-list oracle"),
    QuerySpec("multimodal_audio_fingerprint", M.multimodal_audio_fingerprint,
              M.MULTIMODAL_AUDIO_FINGERPRINT_SQL, ("MM", "DD2", "BONUS"),
              "AUDIO near-dup matching (r12, the pHash sibling): Shazam "
              "constellation landmarks — per-window peak band of a 7-band "
              "fixed-point AC filterbank (inlined-cosine doctrine) — "
              "fanout-paired into (bands, dt, log2-loudness) hashes via "
              "cross-engine bin()-length quantization, per-h md5 cap, "
              "then offset-voting matches at >= AFP_MIN_VOTES; gate pins "
              "the capped hash TABLE and the voted pairs (long format)"),
    QuerySpec("multimodal_caption_audit", M.multimodal_caption_audit,
              M.MULTIMODAL_CAPTION_AUDIT_SQL, ("MM", "DD2", "BONUS"),
              "CROSS-MODAL consistency join (r13, the LAION-style "
              "caption-image audit): composes the pHash code table with "
              "text embeddings over the same doc ids — image near-dup "
              "pairs with their 6dp text cosine, the flagged "
              "imgdup_textdiff subset (< CM_TEXT_LO = mislabeling "
              "candidates), and the reverse textdup_imgdiff audit "
              "(text cosine >= SIM_THRESHOLD, Hamming > PHASH_T); no "
              "new kernels, both sides are existing 16-byte/64-float "
              "states"),
    QuerySpec("docs_bands_incremental", D.docs_bands_incremental,
              D.DOCS_BANDS_INCREMENTAL_SQL, ("DD2", "S3", "BONUS"),
              "incremental LSH signature-MV maintenance: only the arriving "
              "batch is hashed + appended; pairs == full-rebuild oracle"),
    QuerySpec("type_value_percentiles", E.type_value_percentiles,
              E.TYPE_VALUE_PERCENTILES_SQL, ("A1", "BONUS"),
              "exact type-7 quantiles per group (p50/p90/p99) — the "
              "oracle-checkable form; the sketch path is pytest-gated"),
    QuerySpec("knn_bruteforce_batched", V.knn_bruteforce_batched,
              V.KNN_BRUTEFORCE_BATCHED_SQL, ("VS1", "BONUS"),
              "query-batched exact top-k: bounded broadcast per batch, "
              "same rows as the unbatched gate (oracle shared)"),
    QuerySpec("knn_ivf_trained", V.knn_ivf_trained,
              V.KNN_IVF_TRAINED_SQL, ("VS4", "VS2", "BONUS"),
              "IVF over the kmeans_train codebook: the full train->assign->"
              "probe->re-rank ANN pipeline in one gate"),
    QuerySpec("docs_lang_id_ngram", D.docs_lang_id_ngram,
              D.DOCS_LANG_ID_NGRAM_SQL, ("TX2", "BONUS"),
              "char-trigram-profile language ID (Cavnar-Trenkle shape) with "
              "per-lang scores; fixed-precedence argmax"),
    QuerySpec("docs_shuffle_shards", D.docs_shuffle_shards,
              D.DOCS_SHUFFLE_SHARDS_SQL, ("TX5", "BONUS"),
              "deterministic training-order shuffle (TX11 in COVERAGE.md): "
              "md5-keyed permutation, hash-assigned shards, per-shard "
              "position windows (no global sort)"),
    QuerySpec("knn_pq_adc", V.knn_pq_adc, V.KNN_PQ_ADC_SQL,
              ("VS4", "BONUS"),
              "product-quantization ANN (VS5 in COVERAGE.md): per-subspace "
              "Lloyd-trained codebooks, 4-byte corpus codes, asymmetric "
              "distance via per-query lookup tables in exact integer "
              "micro-units"),
    QuerySpec("docs_pii_scrub", PL.docs_pii_scrub, PL.DOCS_PII_SCRUB_SQL,
              ("TX1", "BONUS"),
              "PII redaction pass (TX10 in COVERAGE.md): deterministic "
              "md5-keyed email/phone injection, regex scrub identical "
              "under Java regex and RE2, per-source redaction accounting"),
    QuerySpec("docs_mixture_weights", PL.docs_mixture_weights,
              PL.DOCS_MIXTURE_WEIGHTS_SQL, ("TX5", "A1", "BONUS"),
              "per-source training-mix weights: temperature-scaled "
              "(α=1/2) vs proportional sampling, normalized entirely in "
              "integer space (sqrt micro-units, ppm integer division)"),
    QuerySpec("docs_bm25_search", PL.docs_bm25_search, PL.DOCS_BM25_SEARCH_SQL,
              ("TX8", "W4", "BONUS"),
              "BM25-shaped lexical retrieval (ln-free rational idf for "
              "cross-engine determinism); inverted-index tf/df aggregates, "
              "broadcast query terms, per-query top-k"),
    QuerySpec("docs_top_by_lang", D.docs_top_by_lang, D.DOCS_TOP_BY_LANG_SQL,
              ("A6", "BONUS"),
              "groupArray+arraySort+arrayMap ordered collection "
              "(standalone form of the fused window gate)"),
    QuerySpec("docs_word_filter", D.docs_word_filter, D.DOCS_WORD_FILTER_SQL,
              ("J4", "BONUS"),
              "array-membership semi-join filter (standalone form)"),
    QuerySpec("docs_stratified_sample", D.docs_stratified_sample,
              D.DOCS_STRATIFIED_SAMPLE_SQL, ("TX5", "BONUS"),
              "deterministic hash-stratified per-source sampling "
              "(standalone form)"),
    QuerySpec("docs_pack_sequences", D.docs_pack_sequences,
              D.DOCS_PACK_SEQUENCES_SQL, ("TX6", "BONUS"),
              "concatenation-style LM sequence packing into fixed context "
              "windows (standalone form)"),
    QuerySpec("docs_contamination", PL.docs_contamination,
              PL.DOCS_CONTAMINATION_SQL, ("TX7", "J1", "BONUS"),
              "benchmark decontamination: 5-gram overlap vs broadcast "
              "eval fingerprint set (standalone form; also runs inside "
              "docs_curation_pipeline)"),
    QuerySpec("docs_dup_clusters", D.docs_dup_clusters,
              D.DOCS_DUP_CLUSTERS_SQL, ("DD2", "DD6"),
              "connected-components dedup clusters (label propagation vs "
              "recursive-CTE oracle; standalone form — also runs inside "
              "docs_pair_recall_audit, displaced from the gate window by "
              "the r6 rotation)"),
    QuerySpec("docs_setsim_join", D.docs_setsim_join, D.DOCS_SETSIM_JOIN_SQL,
              ("DD6", "J1", "U3", "BONUS"),
              "EXACT prefix-filtered set-similarity self-join (PPJoin "
              "family): rarest-first canonical token order, integer "
              "threshold arithmetic; oracle = full inverted index, so the "
              "differential proves 100% recall of the prefix filter "
              "(standalone form; also runs inside docs_pair_recall_audit)"),
    QuerySpec("docs_jaccard_pairs", D.docs_jaccard_pairs,
              D.DOCS_JACCARD_PAIRS_SQL, ("DD2", "DD4"),
              "exact n-gram Jaccard verification of LSH candidates "
              "(standalone form; also runs inside docs_pair_recall_audit "
              "— displaced from the gate window by the r6 rotation)"),
    QuerySpec("docs_weighted_sample", D.docs_weighted_sample,
              D.DOCS_WEIGHTED_SAMPLE_SQL, ("TX5", "W2", "BONUS"),
              "weighted systematic sampling (all-integer boundary crossing; "
              "oracle = per-boundary arg_min — independent algorithm); "
              "materializes the picks that docs_mixture_weights' rates call "
              "for"),
    QuerySpec("docs_dedup_exact", D.docs_dedup_exact, D.DOCS_DEDUP_EXACT_SQL,
              ("DD1",), "exact dedup by content hash"),
    QuerySpec("clustered_scan_skipping", AC.clustered_scan_skipping,
              AC.CLUSTERED_SCAN_SKIPPING_SQL, ("P8", "P3", "S4"),
              "partition-pruned + clustered-layout read == raw-table oracle"),
    QuerySpec("docs_unigram_surprisal", D.docs_unigram_surprisal,
              D.DOCS_UNIGRAM_SURPRISAL_SQL, ("TX1", "J5", "BONUS"),
              "CCNet-style corpus-statistics quality signal: inverse-df "
              "surprisal in exact integer ppm (no ln()), vocabulary-sized "
              "broadcast, one corpus explode"),
    QuerySpec("docs_containment_pairs", D.docs_containment_pairs,
              D.DOCS_CONTAINMENT_PAIRS_SQL, ("DD2", "DD4", "BONUS"),
              "asymmetric CONTAINMENT verify over the LSH candidates — "
              "the subset-duplication class symmetric Jaccard misses "
              "(short doc embedded in long): both-direction containment "
              "in exact ppm + subset_dup flag; candidates-only shingle "
              "join, capped band buckets mirrored in the oracle"),
    QuerySpec("docs_decontam_spans", PL.docs_decontam_spans,
              PL.DOCS_DECONTAM_SPANS_SQL, ("TX7", "W2", "BONUS"),
              "surgical span-level decontamination: positional eval-gram "
              "hits merged into maximal excision spans with exact token/"
              "ppm accounting — cummax-window islands vs the anti-join "
              "anchor + position-set-union oracle (two independent "
              "interval algorithms)"),
    QuerySpec("docs_bigram_surprisal", D.docs_bigram_surprisal,
              D.DOCS_BIGRAM_SURPRISAL_SQL, ("TX1", "J5", "BONUS"),
              "bigram-LM conditional surprisal (the CCNet/KenLM perplexity "
              "analog, conditional upgrade of unigram surprisal): "
              "c(w1.)*1e6 div c(w1,w2) per transition in exact integer ppm "
              "— vocabulary-sized left-context broadcast, corpus-scale "
              "bigram hash join, no ln()"),
    QuerySpec("multimodal_scene_cuts", M.multimodal_scene_cuts,
              M.MULTIMODAL_SCENE_CUTS_SQL, ("MM", "W2", "BONUS"),
              "video-style shot-boundary detection: all-integer rational "
              "energy-delta test over the Arrow windowed-feature kernel, "
              "per-doc lag state; char-code oracle"),
    QuerySpec("docs_training_mix", PL.docs_training_mix,
              PL.DOCS_TRAINING_MIX_SQL, ("TX5", "W4", "BONUS"),
              "materialized temperature mix: alpha=1/2 ppm quotas buy "
              "slots of a fixed budget, filled in md5-keyed reproducible "
              "shuffle order — the capstone composing mixture weights + "
              "training-order shuffle"),
    QuerySpec("knn_recall_report", V.knn_recall_report,
              V.KNN_RECALL_REPORT_SQL, ("VS1", "VS3", "BONUS"),
              "evaluation-as-a-query: recall@k of the LSH index vs the "
              "exact scan, integer overlap counts + ppm recall, both "
              "pipelines recomputed by the oracle"),
    QuerySpec("knn_mmr_rerank", V.knn_mmr_rerank, V.KNN_MMR_RERANK_SQL,
              ("VS1", "T1", "BONUS"),
              "maximal-marginal-relevance diversified top-10 from the "
              "exact top-20 shortlist (lambda=1/2): per-query Arrow "
              "grouped-map greedy over a shortlist-sized frame (the LTTB "
              "doctrine) vs the greedy unrolled as 10 generated CTE "
              "steps — kernel and SQL unrolling pin each other"),
    QuerySpec("events_window_funnel", E.events_window_funnel,
              E.EVENTS_WINDOW_FUNNEL_SQL, ("A2", "J1", "P7", "BONUS"),
              "ClickHouse windowFunnel analog: deepest in-order funnel "
              "stage within a 7-day window of the first step — chained "
              "conditional-min aggs, NTZ interval arithmetic (timezone-"
              "proof)"),
    QuerySpec("events_retention_cohorts", E.events_retention_cohorts,
              E.EVENTS_RETENTION_COHORTS_SQL, ("A3", "J1", "BONUS"),
              "ClickHouse retention() analog: weekly cohort x week-offset "
              "distinct-active matrix; calendar-integer week arithmetic on "
              "naive timestamps (timezone-proof)"),
    QuerySpec("docs_cms_counts", D.docs_cms_counts, D.DOCS_CMS_COUNTS_SQL,
              ("A3", "BONUS"),
              "count-min sketch: deterministic mergeable frequency sketch "
              "(d=3 md5 rows x w=64), point estimates vs true counts for "
              "hot/medium/rare/absent probes — over_n >= 0 is the CMS "
              "guarantee, pinned exactly by the differential"),
    QuerySpec("bloom_semijoin_filter", R.bloom_semijoin_filter,
              R.BLOOM_SEMIJOIN_FILTER_SQL, ("P8", "J8", "BONUS"),
              "deterministic Bloom filter (k=3 md5 hashes, m=4096 bits) "
              "over keys-with-orders probed by every customer; exact "
              "hit/false-positive accounting — the bloom skip-index / "
              "runtime-filter analog as an auditable operator"),
    QuerySpec("events_sequence_match", TS.events_sequence_match,
              TS.EVENTS_SEQUENCE_MATCH_SQL, ("A2", "W2", "BONUS"),
              "ClickHouse sequenceMatch/sequenceCount analog: ordered "
              "signup->view->purchase match (+1-day adjacent-step window) "
              "and GREEDY non-overlapping view->purchase pair count via "
              "the Lindley-reflection closed form — the oracle runs the "
              "literal greedy automaton as a recursive CTE, proving the "
              "closed form equals sequential semantics"),
    QuerySpec("events_gap_fill", TS.events_gap_fill,
              TS.EVENTS_GAP_FILL_SQL, ("A8", "W5", "BONUS"),
              "WITH FILL + INTERPOLATE(prev) analog: per-type hourly "
              "spine via distributed sequence() explode, missing buckets "
              "materialized with carry-forward of the last observed "
              "total (last ignorenulls window)"),
    QuerySpec("events_value_histogram", TS.events_value_histogram,
              TS.EVENTS_VALUE_HISTOGRAM_SQL, ("A1", "W2", "BONUS"),
              "histogram()/width_bucket analog: exact integer $25 bins "
              "with per-type counts, cents mass and cumulative CDF"),
    QuerySpec("events_moving_stats", TS.events_moving_stats,
              TS.EVENTS_MOVING_STATS_SQL, ("W2", "A8", "BONUS"),
              "groupArrayMovingSum/runningDifference analog: 3-bucket "
              "moving sums, previous-bucket delta, exact ppm moving "
              "average over observed hourly buckets"),
    QuerySpec("events_lttb_downsample", TS.events_lttb_downsample,
              TS.EVENTS_LTTB_DOWNSAMPLE_SQL, ("ST6", "A8", "BONUS"),
              "largestTriangleThreeBuckets analog: sequential per-series "
              "LTTB downsampling to 24 points — applyInPandas kernel with "
              "exact integer cross-product areas vs a recursive-CTE "
              "NOT-EXISTS argmax oracle in HUGEINT"),
    QuerySpec("semantic_decontam", V.semantic_decontam,
              V.SEMANTIC_DECONTAM_SQL, ("DD3", "TX7", "BONUS"),
              "embedding-space benchmark decontamination: md5-bucket eval "
              "split broadcast with norms, training vectors flagged by "
              "cosine >= threshold with match count + argmax best eval — "
              "the semantic complement of docs_contamination"),
    QuerySpec("docs_kmv_distinct", D.docs_kmv_distinct,
              D.DOCS_KMV_DISTINCT_SQL, ("A3", "BONUS"),
              "KMV bottom-k distinct sketch over 3-gram universe: "
              "deterministic mergeable states — the Spark __all__ row is "
              "built by MERGING per-source sketches while the oracle "
              "computes it directly from the corpus, proving merge "
              "losslessness cross-engine; err_ppm pins estimator accuracy"),
    QuerySpec("docs_kmv_sketch", D.docs_kmv_sketch,
              D.DOCS_KMV_SKETCH_SQL, ("A3", "BONUS"),
              "sketch-only KMV path (what production runs and bench.py "
              "times): per-source bottom-K + lossless merge, NO exact "
              "countDistinct alongside — the gate form above carries the "
              "exact pass purely as err_ppm differential evidence"),
    QuerySpec("user_type_value_map", TS.user_type_value_map,
              TS.USER_TYPE_VALUE_MAP_SQL, ("A6", "U1", "BONUS"),
              "sumMap analog: per-user event_type->cents totals as "
              "aligned key-sorted (keys[], values[]) arrays — collected "
              "list bounded by type-dimension cardinality"),
    QuerySpec("supplier_pagerank", G.supplier_pagerank,
              G.SUPPLIER_PAGERANK_SQL, ("J1", "W4", "BONUS"),
              "damped PageRank over the bipartite customer-supplier "
              "procurement graph: two join-based message-passing pushes "
              "in exact integer milli-units (floor-PageRank), node-sized "
              "rank state, edge table built once — top-25 suppliers with "
              "both iterations pinned"),
    QuerySpec("streaming_positions_state", E.streaming_positions_state,
              E.STREAMING_POSITIONS_STATE_SQL, ("ST6", "ST1", "ST4"),
              "applyInPandasWithState avg-cost positions across 3 real "
              "microbatches == batch recursive-CTE oracle (standalone "
              "form; also runs inside streaming_state_suite — displaced "
              "from the gate window by the r6 rotation)"),
    QuerySpec("streaming_sequence_pairs", TS.streaming_sequence_pairs,
              TS.STREAMING_SEQUENCE_PAIRS_SQL, ("ST6", "ST1", "BONUS"),
              "greedy pair automaton as a REAL applyInPandasWithState "
              "streaming query over 3 microbatches — final per-user "
              "(pending, pairs) state equals the recursive-CTE automaton; "
              "with the batch closed-form gate, three formulations pin "
              "each other"),
    QuerySpec("returns_conditional", R.returns_conditional,
              R.RETURNS_CONDITIONAL_SQL, ("A2", "P4", "P5"),
              "sumIf/countIf (displaced from the gate window by the r7 "
              "interval-family rotation; tags remain window-covered)"),
    QuerySpec("type_quantile_deterministic", TS.type_quantile_deterministic,
              TS.TYPE_QUANTILE_DETERMINISTIC_SQL, ("A1", "W4", "BONUS"),
              "quantileDeterministic analog: md5(event_id)-keyed bottom-K "
              "reservoir (engine- and cluster-size-invariant sample), "
              "nearest-rank p50/p90 in integer cents; exact full-data "
              "quantiles alongside pin the sampling error"),
    QuerySpec("events_top_paths", TS.events_top_paths,
              TS.EVENTS_TOP_PATHS_SQL, ("W4", "A1", "BONUS"),
              "journey/path analysis: per-user ordered 3-step event-type "
              "paths via two leads (no per-user collect), corpus top-10 "
              "by frequency with full-path tiebreak"),
    QuerySpec("events_outlier_buckets", TS.events_outlier_buckets,
              TS.EVENTS_OUTLIER_BUCKETS_SQL, ("W4", "A1", "BONUS"),
              "robust anomaly detection: integer nearest-rank median/MAD "
              "over per-type hourly counts, |n - med| > 3*MAD rule, "
              "(value, bucket) tiebreaks on every median"),
    QuerySpec("orders_snapshot_diff", O.orders_snapshot_diff,
              O.ORDERS_SNAPSHOT_DIFF_SQL, ("S6", "J8", "BONUS"),
              "CDC changelog between two snapshots: deterministic md5 "
              "key-bucket mutations (delete/update/shifted re-insert), "
              "one full-outer join classifies every change; unchanged "
              "keys never emitted — the general form of the REST resync "
              "anti-join"),
    QuerySpec("customer_name_neardup", PL.customer_name_neardup,
              PL.CUSTOMER_NAME_NEARDUP_SQL, ("DD5", "J4", "BONUS"),
              "FastSS edit-distance<=1 blocking: deletion-neighborhood "
              "variant equi-join + exact levenshtein verify vs an oracle "
              "using the numeric no-carry difference characterization — "
              "two completely different algorithms, same pair set"),
    QuerySpec("events_cumulative_distinct_users",
              TS.events_cumulative_distinct_users,
              TS.EVENTS_CUMULATIVE_DISTINCT_USERS_SQL,
              ("A3", "W2", "BONUS"),
              "running distinct via the first-seen rewrite (one min-agg "
              "+ day-spine cumsum) vs the oracle's NAIVE per-day "
              "correlated COUNT DISTINCT — the differential proves the "
              "classic scale rewrite"),
    QuerySpec("docs_heavy_hitters", D.docs_heavy_hitters,
              D.DOCS_HEAVY_HITTERS_SQL, ("A3", "P4", "BONUS"),
              "propose/verify heavy hitters: CMS candidates (overcount "
              "only — no false negatives) pruned by one exact count "
              "join; output pins the final answer AND the candidate "
              "accounting"),
    QuerySpec("join_view_incremental", O.join_view_incremental,
              O.JOIN_VIEW_INCREMENTAL_SQL, ("J1", "ST3", "BONUS"),
              "incremental JOIN-view maintenance: the delta rule "
              "dV = dA x B_new + A_old x dB materialized over md5-split "
              "batches, never re-joining the old state; oracle "
              "recomputes the full join — proves the rule exact"),
    QuerySpec("docs_phrase_search", D.docs_phrase_search,
              D.DOCS_PHRASE_SEARCH_SQL, ("J4", "A6", "BONUS"),
              "exact phrase search via positional inverted index "
              "(aligned-start term intersection, phrase terms broadcast) "
              "vs a plain string-containment oracle — two unrelated "
              "mechanisms; phrase set derived from the corpus itself so "
              "the gate is self-contained at any SF"),
    QuerySpec("events_rolling_p95", TS.events_rolling_p95,
              TS.EVENTS_ROLLING_P95_SQL, ("W2", "A6", "BONUS"),
              "rolling windowed quantile: exact nearest-rank p95 of "
              "per-event cents over the trailing 24 hourly buckets — "
              "sorted per-bucket arrays, frame-bounded flatten+sort, no "
              "sketch, no interpolation"),
    QuerySpec("hourly_vwap", TS.hourly_vwap, TS.HOURLY_VWAP_SQL,
              ("A1", "P1", "BONUS"),
              "volume-weighted average price per (type, hour), weights "
              "JSON-extracted; exact integer numerator/denominator plus "
              "ppm ratio — never a float division"),
    QuerySpec("events_cusum_alarms", TS.events_cusum_alarms,
              TS.EVENTS_CUSUM_ALARMS_SQL, ("W2", "A1", "BONUS"),
              "CUSUM drift detection via the reflection closed form "
              "(two windows, no recursion) vs the literal recursive "
              "automaton oracle — the third closed-form-vs-automaton "
              "differential; integer median/MAD reference levels"),
    QuerySpec("knn_filtered", V.knn_filtered, V.KNN_FILTERED_SQL,
              ("VS1", "P4", "BONUS"),
              "filtered vector search: top-k restricted by a metadata "
              "predicate applied as the broadcast join key, pruning "
              "candidates BEFORE distance math — the pre-filtering ANN "
              "pattern (post-filtering under-returns)"),
    QuerySpec("multimodal_image_patches", M.multimodal_image_patches,
              M.MULTIMODAL_IMAGE_PATCHES_SQL, ("MM", "BONUS"),
              "ViT-style patch extraction: 32x32 byte grid -> 8x8 "
              "patches fanned out executor-side with integer pixel sums "
              "and exact milli-means; char-code grid-arithmetic oracle"),
    QuerySpec("type_weighted_median", TS.type_weighted_median,
              TS.TYPE_WEIGHTED_MEDIAN_SQL, ("A1", "W2", "BONUS"),
              "quantileExactWeighted analog: first running-weight "
              "crossing of half-total vs the oracle's POINTWISE "
              "below/inclusive characterization — two formulations of "
              "weighted median checking each other, all integer"),
    QuerySpec("type_cooccurrence_lift", TS.type_cooccurrence_lift,
              TS.TYPE_COOCCURRENCE_LIFT_SQL, ("A1", "J1", "BONUS"),
              "market-basket association mining: per-user distinct type "
              "baskets, pair supports, exact ppm lift "
              "n_ab*N*1e6 DIV (n_a*n_b) — no floats"),
    QuerySpec("supplier_similarity_cf", G.supplier_similarity_cf,
              G.SUPPLIER_SIMILARITY_CF_SQL, ("J1", "W4", "BONUS"),
              "item-item collaborative-filtering similarity: exact "
              "Jaccard of customer sets from one shared-customer "
              "self-join + broadcast degrees, integer ppm, stable "
              "top-20"),
        QuerySpec("events_drift_chi2", TS.events_drift_chi2,
              TS.EVENTS_DRIFT_CHI2_SQL, ("A1", "P5", "BONUS"),
              "two-sample chi-square drift monitor over md5-parity "
              "halves with a deterministic one-bin injected shift for "
              "one type — integer floor-chi2 per bin, detection (not "
              "just agreement) pinned by the drifted flag"),
    QuerySpec("orders_scd2_history", O.orders_scd2_history,
              O.ORDERS_SCD2_HISTORY_SQL, ("W1", "S4", "BONUS"),
              "SCD type-2 HISTORY MAINTENANCE (the write side of the W1 "
              "read machinery): fold a 3-version snapshot chain into "
              "per-key validity intervals + current flag — lag-window "
              "gaps-and-islands vs the anti-join start/end island "
              "characterization (two island algorithms pin each other); "
              "completes the CDC family detect→apply→historize"),
    QuerySpec("orders_merge_upsert", O.orders_merge_upsert,
              O.ORDERS_MERGE_UPSERT_SQL, ("S4", "J9", "BONUS"),
              "MERGE INTO closing the CDC loop: the extracted change "
              "stream applied back onto snapshot A must reconstruct "
              "snapshot B exactly (oracle builds B directly from the "
              "mutation rules) — per-bucket fingerprint comparison"),
    QuerySpec("nation_top_customers_others", R.nation_top_customers_others,
              R.NATION_TOP_CUSTOMERS_OTHERS_SQL, ("T1", "W4", "BONUS"),
              "leaderboard-with-tail: per-nation top-3 customers plus "
              "one __other__ rollup row — totals conserved (pinned by "
              "the differential), tail aggregated on the reduced frame"),
    QuerySpec("docs_kmv_jaccard", D.docs_kmv_jaccard,
              D.DOCS_KMV_JACCARD_SQL, ("A3", "U3", "BONUS"),
              "KMV sketch SET OPERATIONS: bottom-K-of-union coincidence "
              "estimator for pairwise source Jaccard plus (r15) the "
              "theta-sketch-style A-not-B difference estimate — "
              "deterministic, so oracle-checked bit-for-bit with exact "
              "Jaccard/|A\\\\B| + err ppm alongside; pairwise stage "
              "touches only K-row sketches"),
    QuerySpec("events_seasonality_profile", TS.events_seasonality_profile,
              TS.EVENTS_SEASONALITY_PROFILE_SQL, ("A1", "P7", "BONUS"),
              "calendar seasonality heatmap: ISO dow x hour matrix per "
              "type with exact ppm shares — calendar-integer arithmetic "
              "on naive timestamps (Spark dayofweek shifted to ISO)"),
    QuerySpec("events_column_profile", O.events_column_profile,
              O.EVENTS_COLUMN_PROFILE_SQL, ("A3", "P9", "BONUS"),
              "data-profiling report: per-column row/null/exact-distinct "
              "counts in ONE shared scan (stacked aggregates, no "
              "per-column jobs) — the Deequ/dbt-test staple"),
    QuerySpec("user_activity_streaks", TS.user_activity_streaks,
              TS.USER_ACTIVITY_STREAKS_SQL, ("W2", "W4", "BONUS"),
              "longest consecutive-active-day streak per user via the "
              "date-minus-row_number island anchor — calendar-integer "
              "day arithmetic, no epoch"),
    QuerySpec("events_benford_audit", O.events_benford_audit,
              O.EVENTS_BENFORD_AUDIT_SQL, ("P9", "A1", "BONUS"),
              "Benford first-digit forensics: integer digit extraction "
              "(cents DIV 10^(len-1)), precomputed log10 ppm "
              "expectations, per-type observed shares + deviations"),
    QuerySpec("docs_bpe_merges", PL.docs_bpe_merges,
              PL.DOCS_BPE_MERGES_SQL, ("TX3", "A7", "BONUS"),
              "BPE tokenizer merge TRAINING (Sennrich): one corpus scan "
              "to the word-frequency table, then vocabulary-sized state "
              "per iteration; overlapping weighted pair counts, (count "
              "desc, pair asc) winner, greedy left-to-right fold merge — "
              "Spark F.aggregate closed fold vs per-word recursive-CTE "
              "automaton oracle; realized merges vs proposed counts both "
              "pinned"),
    QuerySpec("supplier_reach_bfs", G.supplier_reach_bfs,
              G.SUPPLIER_REACH_BFS_SQL, ("J1", "U3", "BONUS"),
              "multi-hop BFS reachability over the bipartite procurement "
              "graph: layered frontier message passing (equi-join + "
              "visited anti-join per level, node-sized state, persisted "
              "edge table) vs recursive-CTE closure with UNION dedup and "
              "MIN(d) — closure and frontier pin each other"),
    QuerySpec("join_cardinality_estimate", O.join_cardinality_estimate,
              O.JOIN_CARDINALITY_ESTIMATE_SQL, ("A3", "J1", "BONUS"),
              "sample-based join-size estimation (the join synopsis "
              "trick): correlated md5 KEY sample preserves per-key "
              "multiplicities, sampled join scaled 1/p vs exact join, "
              "signed error ppm — deterministic, so the whole estimator "
              "is oracle-checked like the KMV/CMS sketches"),
    QuerySpec("events_rolling_distinct_users", TS.events_rolling_distinct_users,
              TS.EVENTS_ROLLING_DISTINCT_USERS_SQL, ("A3", "W2", "BONUS"),
              "exact 24-hour sliding-window distinct users per type via "
              "the user-coverage interval sweep (r7: per-user lag merge "
              "of [h, h+23] coverage, boundary deltas, calendar-bounded "
              "per-type running sum — O(1) per-task state, no 24x "
              "expand) vs the oracle's range-join direct recount"),
    QuerySpec("events_rolling_distinct_kmv", TS.events_rolling_distinct_kmv,
              TS.EVENTS_ROLLING_DISTINCT_KMV_SQL, ("A3", "W2", "BONUS"),
              "the APPROXIMATE tier of the same sliding distinct: "
              "per-(type, hour) bottom-K KMV sketches merged over the "
              "trailing RANGE(-23,0) frame — per-row state is a "
              "CONSTANT 24K hashes at any user cardinality (the "
              "mergeability-of-bottom-k property, deterministic so the "
              "oracle matches exactly) vs the range-join re-sketch"),
    QuerySpec("customer_entity_clusters", PL.customer_entity_clusters,
              PL.CUSTOMER_ENTITY_CLUSTERS_SQL, ("DD2", "J1", "BONUS"),
              "full entity-resolution pipeline: FastSS blocking -> exact "
              "levenshtein<=1 match -> connected-components clustering "
              "with per-cluster sizes — both layers keep independent "
              "oracles (numeric no-carry pair characterization + "
              "recursive-CTE transitive closure)"),
    QuerySpec("fk_integrity_audit", O.fk_integrity_audit,
              O.FK_INTEGRITY_AUDIT_SQL, ("P9", "J8", "BONUS"),
              "referential-integrity report (the dbt relationships test): "
              "per FK edge, child/null/orphan counts plus dimension "
              "coverage ppm — left_anti orphan joins vs NOT EXISTS "
              "oracle"),
    QuerySpec("events_moment_profile", O.events_moment_profile,
              O.EVENTS_MOMENT_PROFILE_SQL, ("A1", "P1", "BONUS"),
              "exact higher-moment numeric profiling: per-type count/sum/"
              "mean plus second- and third-central-moment numerators from "
              "raw power sums in DECIMAL(38,0)/HUGEINT — mergeable plain "
              "SUMs (the -State/-Merge property free), exact integer "
              "milli-unit mean/variance, no float anywhere"),
    QuerySpec("events_key_skew_profile", O.events_key_skew_profile,
              O.EVENTS_KEY_SKEW_PROFILE_SQL, ("A1", "T1", "BONUS"),
              "shuffle-key skew diagnostic: per candidate key dimension, "
              "key cardinality, hottest-key ppm share, top-8 mass (the x8 "
              "salting planner), and HHI concentration in exact ppm "
              "(DECIMAL(38)/HUGEINT) — TakeOrdered top-k, never a global "
              "window over the key frame"),
    QuerySpec("events_funnel_dropoff", TS.events_funnel_dropoff,
              TS.EVENTS_FUNNEL_DROPOFF_SQL, ("A2", "W2", "BONUS"),
              "funnel conversion table: per-stage reach (cumulative from "
              "deepest), stage-over-stage and from-first ppm conversion "
              "— composes events_window_funnel's exact semantics"),
    QuerySpec("docs_lang_confusion", D.docs_lang_confusion,
              D.DOCS_LANG_CONFUSION_SQL, ("TX2", "A1", "BONUS"),
              "language-ID confusion matrix: labeled x predicted counts "
              "+ per-label ppm shares over the per-row gate's exact "
              "logic — the classifier-evaluation artifact"),
    QuerySpec("user_interevent_gaps", TS.user_interevent_gaps,
              TS.USER_INTEREVENT_GAPS_SQL, ("W2", "W4", "BONUS"),
              "latency analytics: per-user inter-event gap seconds via "
              "timestampdiff on naive timestamps (tz-proof), nearest-"
              "rank median/p90 with unique tiebreaks"),
    QuerySpec("docs_fold_assignment", PL.docs_fold_assignment,
              PL.DOCS_FOLD_ASSIGNMENT_SQL, ("TX5", "BONUS"),
              "deterministic md5 k-fold train/val splits, reproducible "
              "across runs and cluster sizes; per-(source, fold) counts "
              "+ uniform-share deviation in ppm"),
    QuerySpec("docs_length_buckets", PL.docs_length_buckets,
              PL.DOCS_LENGTH_BUCKETS_SQL, ("TX6", "BONUS"),
              "length-bucketed batching: power-of-two token buckets, "
              "md5-ordered deterministic batch ids, and the exact "
              "padding-waste saving vs global-max padding"),
    QuerySpec("docs_vocab_divergence", PL.docs_vocab_divergence,
              PL.DOCS_VOCAB_DIVERGENCE_SQL, ("TX8", "U2", "BONUS"),
              "corpus-mixing diagnostic: pairwise L1 (2x total "
              "variation) between per-source token distributions in "
              "exact integer ppm over the union vocabulary"),
    QuerySpec("type_equidepth_deciles", TS.type_equidepth_deciles,
              TS.TYPE_EQUIDEPTH_DECILES_SQL, ("A1", "W4", "BONUS"),
              "equi-depth decile binning (feature engineering): "
              "nearest-rank boundaries, purely value-based bucket "
              "assignment via broadcast boundary lists, per-bucket "
              "counts + exact mass"),
    QuerySpec("purchase_attribution_ushape", TS.purchase_attribution_ushape,
              TS.PURCHASE_ATTRIBUTION_USHAPE_SQL, ("J6", "W4", "BONUS"),
              "U-shaped (position-based) multi-touch attribution in exact "
              "ppm: Spark materializes per-touch credits (40/20/40 with "
              "deterministic middle remainder) and aggregates; the oracle "
              "derives class totals in CLOSED FORM from k alone — the "
              "differential is a conservation proof of the per-touch "
              "scheme"),
    QuerySpec("purchase_attribution", TS.purchase_attribution,
              TS.PURCHASE_ATTRIBUTION_SQL, ("J6", "A4", "BONUS"),
              "first-touch vs last-touch attribution: min/max view "
              "struct per purchase over a 1-day lookback (the as-of "
              "machinery in both directions) + model-disagreement "
              "counts"),
    QuerySpec("docs_robust_scaled", PL.docs_robust_scaled,
              PL.DOCS_ROBUST_SCALED_SQL, ("TX1", "W4", "BONUS"),
              "robust-scaler normalization: per-source integer robust "
              "z-score (x-med)*1e6 DIV max(mad,1), emitting the >2-sigma "
              "tails — preprocessing twin of the MAD outlier rule"),
    QuerySpec("docs_novelty_curve", PL.docs_novelty_curve,
              PL.DOCS_NOVELTY_CURVE_SQL, ("DD1", "TX1", "BONUS"),
              "corpus novelty / dedup-ROI curve: per-doc fraction of "
              "3-grams never seen in earlier docs via the first-seen "
              "min-agg trick (no quadratic seen-so-far state), per "
              "100-doc bucket in exact ppm"),
    QuerySpec("brand_type_cube", R.brand_type_cube, R.BRAND_TYPE_CUBE_SQL,
              ("A1", "A9", "BONUS"),
              "full CUBE over (brand, type): all four grouping levels in "
              "one pass with the standard grouping_id bitmask, exact "
              "integer cents — companion of regional_rollup's ROLLUP"),
QuerySpec("multimodal_doc_frames", M.multimodal_doc_frames,
              M.MULTIMODAL_DOC_FRAMES_SQL, ("MM",),
              "binary payload -> executor-side frame fan-out -> per-source "
              "aggregate (Arrow mapInPandas vs substring/sha256 oracle)"),
QuerySpec("knn_ann_lsh", V.knn_ann_lsh, V.KNN_ANN_LSH_SQL,
              ("VS3",), "random-hyperplane LSH ANN with exact re-rank"),
    QuerySpec("docs_bpe_encode", PL.docs_bpe_encode,
              PL.DOCS_BPE_ENCODE_SQL, ("TX3", "J5", "BONUS"),
              "distributed BPE ENCODE with the trained merge list: K "
              "greedy folds applied once per DISTINCT word (vocab-sized "
              "work), per-doc token counts via broadcast vocab join; "
              "Spark re-encodes from the rule list while the oracle "
              "reads the training chain's final word states — "
              "encode(rules) == train-final pinned cross-engine"),
    QuerySpec("docs_dup_ngram_spans", D.docs_dup_ngram_spans,
              D.DOCS_DUP_NGRAM_SPANS_SQL, ("DD1", "W2", "BONUS"),
              "cross-document duplicated-substring spans (exact-substring "
              "dedup signal): positions whose 6-gram repeats across docs, "
              "merged into maximal spans — Spark lag-window islands vs "
              "oracle coverage-set anti-join, all-integer output (displaced from the window by the r7 chunk-rewrite swap)"),
    QuerySpec("knn_ivf_incremental", V.knn_ivf_incremental,
              V.KNN_IVF_INCREMENTAL_SQL, ("VS4", "S3", "BONUS"),
              "incremental IVF cell-index maintenance: frozen "
              "base-trained codebook, ONLY the arriving batch is "
              "assigned and appended to the persisted cell table; "
              "append == scratch-rebuild oracle bit-for-bit (the ANN "
              "mirror of docs_bands_incremental)"),
    QuerySpec("events_quantile_select", TS.events_quantile_select,
              TS.EVENTS_QUANTILE_SELECT_SQL, ("A1", "W4", "BONUS"),
              "exact p50/p90/p99 order-statistic selection per type "
              "WITHOUT a global sort: two-level histogram selection "
              "(domain-bounded bucket pass -> rank-k bucket locate -> "
              "value pass over target buckets only), fully declarative, "
              "vs the oracle's literal full-sort ROW_NUMBER pick"),
    QuerySpec("parts_coorder_triangles", G.parts_coorder_triangles,
              G.PARTS_COORDER_TRIANGLES_SQL, ("J1", "W4", "BONUS"),
              "triangle counting on the parts co-order graph via "
              "degree-ordered orientation (out-degree bounded "
              "O(sqrt(m)), wedge work O(m^1.5), each triangle closed "
              "once at its (degree,id)-minimal apex) vs the oracle's "
              "id-canonical textbook triple join"),
    QuerySpec("events_value_mad_outliers", TS.events_value_mad_outliers,
              TS.EVENTS_VALUE_MAD_OUTLIERS_SQL, ("A1", "P5", "BONUS"),
              "median/MAD robust outlier detection per type (50% "
              "breakdown point vs mean/stddev z-scores): the exact "
              "selection machinery run twice (median, then median of "
              "absolute deviations) + one integer 3-MAD flag pass, vs "
              "the oracle's double full-sort ROW_NUMBER rank-k"),
    QuerySpec("events_hourly_autocov", TS.events_hourly_autocov,
              TS.EVENTS_HOURLY_AUTOCOV_SQL, ("A1", "W2", "BONUS"),
              "seasonality detection: exact lag-1h/24h autocovariance "
              "numerators of the hourly volume series in DECIMAL(38) "
              "(calendar-bounded series, sparse equi-join pairing) vs "
              "the oracle's dense calendar-spine LAG window — gap "
              "handling pinned cross-engine"),
    QuerySpec("events_forecast_backtest", TS.events_forecast_backtest,
              TS.EVENTS_FORECAST_BACKTEST_SQL, ("A1", "W2", "BONUS"),
              "forecast backtesting of the persistence (lag-1h) and "
              "seasonal-naive (lag-24h) baselines over the hourly "
              "series: exact integer bias/MAE-milli/WAPE-ppm error "
              "metrics; same sparse-join-vs-dense-spine-LAG "
              "differential as the autocovariance gate"),
    QuerySpec("props_bucket_agg", E.props_bucket_agg, E.PROPS_BUCKET_AGG_SQL,
              ("A1",), "JSON extraction + agg (§2.8 JSON; gated in-window "
              "r5-r6, displaced to the tail by events_series_suite in r7 "
              "which executes this exact pipeline as its 'props' path)"),
    QuerySpec("near_dup_embeddings", V.near_dup_embeddings,
              V.NEAR_DUP_EMBEDDINGS_SQL, ("DD3", "VS1"),
              "embedding-cosine near-dup pairs (gated in-window r1-r6, "
              "displaced to the tail by parts_graph_suite in r7; DD3/VS1 "
              "stay window-covered by semdedup_prune / knn_rank_fusion)"),
    QuerySpec("events_qdigest_quantiles", TS.events_qdigest_quantiles,
              TS.EVENTS_QDIGEST_QUANTILES_SQL, ("A3", "A7", "BONUS"),
              "q-digest: the deterministic MERGEABLE quantile sketch "
              "(dyadic-range counts over a 2^17-cent universe, "
              "level-synchronous bottom-up compression at t = n DIV 64) "
              "completing the sketch family's rank axis; per-type Arrow "
              "tree-DP over universe-bounded leaf histograms + "
              "distributed exact rank audit (le_ok/lt_ok pin the "
              "q-digest error guarantee) vs the oracle's 17 unrolled "
              "MATERIALIZED level stages"),
    QuerySpec("events_decayed_leaderboard", TS.events_decayed_leaderboard,
              TS.EVENTS_DECAYED_LEADERBOARD_SQL, ("T1", "A10", "BONUS"),
              "exponentially-decayed trending leaderboard "
              "(exponentialTimeDecayedSum analog) with EXACT decay: "
              "whole-day ages vs an injected anchor, powers-of-2 "
              "bit-shift weights at 1-day and 7-day half-lives, "
              "DECIMAL(38,0) scores; one map-side-combinable groupBy + "
              "TakeOrdered(20), additive per-(user,day) incremental form"),
    QuerySpec("docs_compaction_plan", PL.docs_compaction_plan,
              PL.DOCS_COMPACTION_PLAN_SQL, ("S3", "W2", "BONUS"),
              "small-file compaction planner (lakehouse OPTIMIZE / "
              "MergeTree background-merge analog): offset-binning "
              "bin = cum_bytes_before DIV target — the deterministic "
              "parallel alternative to sequential greedy first-fit, one "
              "window cumsum per partition; oracle assigns via range "
              "join against generated bin boundaries"),
    QuerySpec("knn_mutual_pairs", V.knn_mutual_pairs,
              V.KNN_MUTUAL_PAIRS_SQL, ("VS3", "W4", "BONUS"),
              "mutual (reciprocal) k-NN pairs — the SNN-clustering / "
              "high-precision near-dup graph primitive: 6-plane LSH "
              "candidate buckets, persisted pair frame feeding both "
              "direction views, per-node rank windows, pair kept only "
              "if each endpoint top-K ranks the other (both ranks "
              "emitted)"),
    QuerySpec("embeddings_sq8_audit", V.embeddings_sq8_audit,
              V.EMBEDDINGS_SQ8_AUDIT_SQL, ("VS5", "A1", "BONUS"),
              "int8 scalar quantization (the FAISS/Milvus SQ8 index "
              "tier): per-dim min/max ranges (DIM-row broadcast) map "
              "each float to an 8-bit code; per-vector code checksums + "
              "exact reconstruction-error accounting, all integer "
              "micro-unit arithmetic (non-negative DIV operands agree "
              "across engines); one corpus scan, no shuffle beyond the "
              "final per-vector agg"),
    QuerySpec("knn_nsw_search", V.knn_nsw_search,
              V.KNN_NSW_SEARCH_SQL, ("VS3", "W4", "BONUS"),
              "graph-ANN SERVE path: deterministic greedy beam search "
              "(beam 8, 3 fixed hops, md5-chosen entry points) over the "
              "corpus-split NSW graph, same query/corpus split and "
              "output shape as knn_bruteforce so the exact scan is the "
              "recall reference (hop-monotone recall pinned in "
              "tests/test_nsw.py); per-query work O(B*K*H) scores — "
              "never a corpus scan; oracle = the graph chain + unrolled "
              "MATERIALIZED hop CTEs with NOT-EXISTS visited dedup"),
    QuerySpec("knn_nsw_graph", V.knn_nsw_graph,
              V.KNN_NSW_GRAPH_SQL, ("VS3", "W4", "BONUS"),
              "graph-based ANN (the HNSW/NSW family): NN-descent-style "
              "construction — LSH-bucketed candidate kNN graph refined "
              "by NSW_ROUNDS neighbor-of-neighbor rounds, per-node "
              "top-K by 6dp cosine with id tiebreaks; the deterministic "
              "final adjacency IS the gated state (HLL-registers "
              "doctrine), recall@K vs exact pinned in tests/test_nsw.py; "
              "standalone form — also runs inside ann_index_audit for "
              "its in-window check; oracle = unrolled MATERIALIZED "
              "round CTEs"),
    QuerySpec("knn_bq_hamming", V.knn_bq_hamming,
              V.KNN_BQ_HAMMING_SQL, ("VS4", "BONUS"),
              "BINARY QUANTIZATION — the 1-bit/dim compression tier: "
              "sign codes in two 32-bit words (bit 63 overflows "
              "DuckDB's checked shift / wraps in Spark), Hamming "
              "shortlist via xor+bit_count over the 8-byte code scan, "
              "exact re-rank on raw embeddings; shortlist recall@10 = "
              "0.70 pinned in tests/test_ivfpq.py"),
    QuerySpec("knn_ivfpq_adc", V.knn_ivfpq_adc,
              V.KNN_IVFPQ_ADC_SQL, ("VS4", "BONUS"),
              "IVF-PQ with RESIDUAL encoding (FAISS IndexIVFPQ, the "
              "standard billion-scale composition): per-cell exact "
              "centroids, PQ codebooks Lloyd-trained on residuals "
              "x - centroid(cell), top-1 cell probe by 6dp cosine, "
              "query-residual ADC over the probed cell's codes only, "
              "exact re-rank of the shortlist on raw embeddings; "
              "micro-unit integer distances; ADC-vs-exact quality "
              "pinned in tests/test_ivfpq.py"),
    QuerySpec("knn_hnsw_search", V.knn_hnsw_search,
              V.KNN_HNSW_SEARCH_SQL, ("VS3", "W4", "BONUS"),
              "MULTI-LAYER NSW (the HNSW hierarchy): md5-sampled nested "
              "layers (1/8 per level, 495/78/10 fixture pyramid), one "
              "NSW build per layer with population-scaled bucketings, "
              "then layer-DESCENDING beam search (narrow beams up top, "
              "full beam only at layer 0) — one gate pins both the layered "
              "adjacency state and the serve results in long format; "
              "descent recall@10 beats the flat beam (pinned in "
              "tests/test_hnsw.py); oracle = three prefixed MATERIALIZED "
              "graph chains + unrolled descent-hop CTEs"),
    QuerySpec("knn_nsw_incremental", V.knn_nsw_incremental,
              V.KNN_NSW_INCREMENTAL_SQL, ("VS3", "W4", "BONUS"),
              "INCREMENTAL INSERT for the graph-ANN tier (the "
              "lsh_incr/ivf_incr maintenance story): md5 position-8 1/16 "
              "append batch attaches via full-corpus capped LSH-forest "
              "buckets + one expand-capped hop over the base graph, "
              "then bidirectional-connect repair re-ranks ONLY the "
              "affected base nodes — untouched base rows pass through "
              "VERBATIM; final adjacency is the gated deterministic "
              "state, insert quality vs rebuild pinned in "
              "tests/test_nsw.py"),
    QuerySpec("knn_hnsw_incremental", V.knn_hnsw_incremental,
              V.KNN_HNSW_INCREMENTAL_SQL, ("VS3", "W4", "BONUS"),
              "LAYERED incremental insert (HNSW Alg.1): new nodes draw "
              "a level from the md5 geometric distribution and insert "
              "into every layer <= it (batch split on an independent "
              "md5 position); each nested layer runs the flat "
              "incremental core with its own forest sizing/rounds — "
              "closes the maintenance family at the top tier; oracle = "
              "three prefixed incremental chains under one nrm CTE"),
    QuerySpec("knn_nsw_delete", V.knn_nsw_delete,
              V.KNN_NSW_DELETE_SQL, ("VS3", "W4", "BONUS"),
              "TOMBSTONE DELETE + compaction for the graph-ANN tier "
              "(the last CRUD leg): md5 position-9 1/16 victim batch; "
              "edges touching tombstones drop, affected survivors "
              "re-rank over surviving edges + BRIDGES through dead "
              "neighbors + survivor-forest bucket re-exposure — "
              "untouched rows verbatim, base build shared via the "
              "flat-graph memo; servability pinned in "
              "tests/test_nsw_delete.py"),
    QuerySpec("knn_hnsw_delete", V.knn_hnsw_delete,
              V.KNN_HNSW_DELETE_SQL, ("VS3", "W4", "BONUS"),
              "LAYERED tombstone delete: a victim is erased from EVERY "
              "layer it belongs to (GDPR erasure cannot stay reachable "
              "through an upper routing layer); each nested layer runs "
              "the flat compaction core with its own forest "
              "sizing/rounds, layer graphs shared with hnsw_search via "
              "the memo — closes CRUD at both index tiers; oracle = "
              "three prefixed compaction chains under one nrm CTE"),
    QuerySpec("knn_nsw_reembed", V.knn_nsw_reembed,
              V.KNN_NSW_REEMBED_SQL, ("VS3", "W4", "BONUS"),
              "VECTOR UPDATE (re-embedding refresh — the model-upgrade "
              "story): md5 position-10 1/16 batch gets new vectors (a "
              "deterministic dimension rotation); compact them out of "
              "the standing index (the delete machinery), re-attach "
              "with the refreshed embeddings (the insert machinery over "
              "a CASE-refresh corpus view, prebuilt base = the "
              "compaction) — CRUD's third leg as a pure composition; "
              "oracle = delete chain + insert chain over uemb/unrm"),
    QuerySpec("knn_opq_adc", V.knn_opq_adc,
              V.KNN_OPQ_ADC_SQL, ("VS4", "BONUS"),
              "OPQ-style rotation before PQ (the FAISS OPQMatrix rung): "
              "deterministic signed-Hadamard rotation — md5 per-dim "
              "sign flips, H[u][x] = (-1)^popcount(u&x) computed "
              "in-engine from bit_count parity, exact BIGINT micro-unit "
              "arithmetic, one final identical IEEE division — then the "
              "knn_pq_adc core VERBATIM over the rotated frame (codes, "
              "ADC estimates, in-cell exhaustive re-rank all gated in "
              "rotated space); round-trip exactness + orthogonality "
              "pinned in tests/test_opq.py"),
    QuerySpec("knn_hnsw_reembed", V.knn_hnsw_reembed,
              V.KNN_HNSW_REEMBED_SQL, ("VS3", "W4", "BONUS"),
              "LAYERED vector update: levels are id-derived, so "
              "re-embedding cannot move a node across layers — layered "
              "update is the flat delete-then-insert composition run "
              "once per nested layer over its population; layer graphs "
              "share the hnsw memo keys and the layer-0 refresh shares "
              "knn_nsw_reembed's whole-result memo — closes the last "
              "asymmetry in the six-leg CRUD gate matrix; oracle = "
              "per-layer compaction+insert chains over shared "
              "uemb/unrm CASE-refresh views"),
    QuerySpec("knn_nsw_search_maintained", V.knn_nsw_search_maintained,
              V.KNN_NSW_SEARCH_MAINTAINED_SQL, ("VS3", "W4", "BONUS"),
              "SERVE over the MAINTAINED index (users query indexes, "
              "not adjacencies): insert the append batch, tombstone-"
              "compact the post-insert graph (prebuilt base — only the "
              "blast radius paid), then beam-search it with survivor-"
              "drawn entry points; output = serve rows + two hash-"
              "checked audit rows (tombstoned neighbors served == 0, "
              "inserted vectors served >= 1 — fresh appends retrievable "
              "immediately, erased vectors never); oracle = the three "
              "existing fragments composed, zero new logic"),
    QuerySpec("user_churn_hazard", TS.user_churn_hazard,
              TS.USER_CHURN_HAZARD_SQL, ("A1", "W2", "BONUS"),
              "survival analysis: Nelson-Aalen cumulative churn hazard "
              "over user lifetimes with right-censoring at the injected "
              "horizon — hazard terms floored in ppm then SUMMED (the "
              "order-insensitive alternative to the Kaplan-Meier "
              "product), reverse-cumsum risk sets on a calendar-bounded "
              "duration spine"),
    QuerySpec("events_encoding_advisor", R.events_encoding_advisor,
              R.EVENTS_ENCODING_ADVISOR_SQL, ("P8", "A3", "BONUS"),
              "column encoding advisor (LowCardinality/codec chooser "
              "analog): exact per-column n/distinct/bytes/run-length "
              "profile in ONE unpivoted stack() pass with per-day run "
              "windows, cross-multiplied integer thresholds -> "
              "rle/dict/plain verdict; oracle = four per-column LAG "
              "branches UNION ALL"),
    QuerySpec("events_qdigest_merge", TS.events_qdigest_merge,
              TS.EVENTS_QDIGEST_MERGE_SQL, ("A3", "A7", "BONUS"),
              "the quantile -State/-Merge proof: independent half-month "
              "q-digests (own thresholds) merged by node-state union + "
              "generalized re-compression (original internal states join "
              "the pair decision — the canonical c_pair + c_parent <= t "
              "condition), quantiles answered from the MERGED sketch "
              "with the combined (QD_BITS+1)*(t_a+t_b+t) error bound "
              "audited; oracle = two unrolled half-builds + 17 "
              "generalized merge levels"),
    QuerySpec("events_hourly_crosscov", TS.events_hourly_crosscov,
              TS.EVENTS_HOURLY_CROSSCOV_SQL, ("A1", "J1", "BONUS"),
              "cross-series covariance (the correlation matrix's "
              "off-diagonal next to the autocov gate's diagonal): exact "
              "DECIMAL(38) numerators per unordered type pair over "
              "both-present hours; sparse equi-join pairing vs the "
              "oracle's dense-spine self-join"),
    QuerySpec("streaming_qdigest_state", TS.streaming_qdigest_state,
              TS.STREAMING_QDIGEST_STATE_SQL, ("ST6", "A3", "BONUS"),
              "the q-digest as STREAMING STATE: a real "
              "applyInPandasWithState query accumulates the per-type "
              "universe-bounded leaf histogram across 3 microbatches "
              "and emits refreshed quantile estimates per batch; the "
              "final streamed estimates equal the batch sketch gate "
              "(pure-function-of-histogram contract) — oracle = the "
              "batch q-digest SQL minus audit columns"),
    # displaced from the window by the r8 rotations (tags remain covered;
    # both keep their local oracle checks)
    QuerySpec("last_view_before_purchase", E.last_view_before_purchase,
              E.LAST_VIEW_BEFORE_PURCHASE_SQL, ("J6",),
              "as-of join (oracle: native ASOF JOIN)"),
    QuerySpec("docs_dedup_keep_best", D.docs_dedup_keep_best,
              D.DOCS_DEDUP_KEEP_BEST_SQL, ("DD1", "A4", "BONUS"),
              "duplicate-cluster representative selection: bag-of-words "
              "signature clusters, keep the longest copy (struct max_by vs "
              "encoded-integer arg_min oracle); quantifies dropped chars"),
    QuerySpec("events_counter_delta_sum", TS.events_counter_delta_sum,
              TS.EVENTS_COUNTER_DELTA_SUM_SQL, ("W2", "A2", "BONUS"),
              "counter-reset semantics (deltaSum / SNMP wrap "
              "correction): a deterministic wrapping counter derived "
              "from the running cents total MOD 1e6; wrap-corrected "
              "increase by CLOSED FORM last + resets*M vs the oracle's "
              "literal per-row fold, plus conservative deltaSum "
              "(negatives dropped) per-row in both engines"),
    QuerySpec("events_seasonal_residual_outliers",
              TS.events_seasonal_residual_outliers,
              TS.EVENTS_SEASONAL_RESIDUAL_OUTLIERS_SQL,
              ("A1", "W4", "BONUS"),
              "STL-lite seasonally-adjusted anomaly detection: "
              "per-(type, hour-of-day) nearest-rank median baseline -> "
              "residuals -> deseasonalized MAD -> integer 3-MAD flags — "
              "the composition plain median/MAD misses (a normal-for-3PM "
              "spike can be a 10x anomaly for 3AM); calendar-bounded "
              "partitions end-to-end"),
    QuerySpec("user_rfm_segments", TS.user_rfm_segments,
              TS.USER_RFM_SEGMENTS_SQL, ("A1", "T1", "BONUS"),
              "RFM segmentation cube (recency/frequency/monetary "
              "quintiles): VALUE-threshold cuts from the two-level "
              "histogram selection (12 broadcast scalars, one unpivoted "
              "selection pass for all three axes — no global sort or "
              "global ntile over the unbounded user axis) vs the "
              "oracle's literal full-sort rank-k thresholds"),
    QuerySpec("cohort_ltv_curves", TS.cohort_ltv_curves,
              TS.COHORT_LTV_CURVES_SQL, ("A1", "W2", "BONUS"),
              "cohort LTV curves (the monetization companion to the "
              "retention matrix): first-activity ISO-week cohorts, "
              "exact cumulative cents per week offset + normalized "
              "ltv_ppm; calendar-bounded window vs the oracle's "
              "window-free self-join range aggregation"),
    QuerySpec("user_volume_concentration", TS.user_volume_concentration,
              TS.USER_VOLUME_CONCENTRATION_SQL, ("A1", "A2", "BONUS"),
              "Pareto / whale-concentration curve: per monetary-decile "
              "threshold (histogram-selection broadcast scalars, no "
              "global sort) the exact user count and ppm volume share "
              "above it — the 80/20 diagnostic; oracle = full-sort "
              "rank-k thresholds + identical conditional aggregation"),
    QuerySpec("events_value_drift", TS.events_value_drift,
              TS.EVENTS_VALUE_DRIFT_SQL, ("A1", "A2", "BONUS"),
              "distribution-drift monitor (PSI shape) between the "
              "month's halves: per (type, value-bucket) exact counts + "
              "integer ppm shares + |delta-share| (TVD terms); one "
              "map-side-combinable scan; the float PSI is a pure "
              "function of the histogram, numpy-checked in tests"),
    QuerySpec("events_ab_arm_stats", TS.events_ab_arm_stats,
              TS.EVENTS_AB_ARM_STATS_SQL, ("A1", "A2", "BONUS"),
              "A/B experimentation sufficient statistics: user-level md5 "
              "arm split, per (type, arm) exact n / sum / sum-of-squares "
              "(DECIMAL(38,0)); one map-side-combinable scan — the Welch "
              "t statistic is a pure function of the six numbers, "
              "checked vs numpy in tests"),
    QuerySpec("events_hll_register_histogram",
              TS.events_hll_register_histogram,
              TS.EVENTS_HLL_REGISTER_HISTOGRAM_SQL, ("A3", "BONUS"),
              "HyperLogLog made deterministic at the REGISTER level: "
              "md5-derived 256 registers, per-register max-rho (a "
              "mergeable -State aggregate), register histogram emitted "
              "all-integer; the two engines derive leading zeros by "
              "independent formulas (41-len(bin) vs strpos of padded "
              "binary); the float estimate is a pure function of the "
              "histogram, checked in tests"),
    QuerySpec("user_gini_inequality", TS.user_gini_inequality,
              TS.USER_GINI_INEQUALITY_SQL, ("A1", "W2", "BONUS"),
              "exact Gini / mean-absolute-difference over per-user "
              "monetary: sorted-multiset closed form on the hierarchical "
              "prefix-sum ladder (DECIMAL(38,0) sums) vs the oracle's "
              "literal quadratic pairwise definition"),
    QuerySpec("suppliers_kept_waiting", R.suppliers_kept_waiting,
              R.SUPPLIERS_KEPT_WAITING_SQL, ("J8", "A9", "T1", "BONUS"),
              "TPC-H Q21 shape: the correlated EXISTS + NOT-EXISTS "
              "quantifier composition rewritten as per-order aggregates "
              "(n_sup >= 2 AND n_slow == 1) — one shuffle, no correlated "
              "scan — vs the oracle's literal EXISTS/NOT-EXISTS "
              "subqueries; deterministic top-k"),
    QuerySpec("customer_order_distribution",
              R.customer_order_distribution,
              R.CUSTOMER_ORDER_DISTRIBUTION_SQL, ("J9", "A1", "BONUS"),
              "TPC-H Q13 shape: orders-per-customer histogram including "
              "zero-order customers (left join + double agg) vs the "
              "oracle's correlated scalar-subquery count"),
    QuerySpec("events_robust_means", TS.events_robust_means,
              TS.EVENTS_ROBUST_MEANS_SQL, ("A1", "A2", "BONUS"),
              "winsorized + trimmed means per type: exact p10/p90 "
              "order-statistic thresholds (histogram selection, "
              "broadcast) then one conditional clamp/trim aggregation — "
              "all integer, mean as *1000 DIV n; oracle = full-sort "
              "rank-k thresholds + identical arithmetic"),
    QuerySpec("user_max_drawdown", TS.user_max_drawdown,
              TS.USER_MAX_DRAWDOWN_SQL, ("W2", "A10", "BONUS"),
              "max drawdown over each user's signed equity curve: "
              "running-cummax windows + one hash agg (exact cents) vs "
              "the oracle's literal quadratic pair definition "
              "max_{i<=j}(P_i - P_j) — the Lindley-doctrine differential"),
    QuerySpec("events_multitouch_attribution",
              TS.events_multitouch_attribution,
              TS.EVENTS_MULTITOUCH_ATTRIBUTION_SQL, ("J6", "A2", "BONUS"),
              "linear multi-touch revenue attribution: every view in the "
              "72h lookback shares a purchase's cents (DIV k, remainder "
              "to the earliest touch — credit conserves exactly); "
              "attribution-lag histogram per user with direct (-1) rows; "
              "oracle derives k/first-touch via pointwise aggregates "
              "instead of windows"),
    QuerySpec("docs_vocab_growth", D.docs_vocab_growth,
              D.DOCS_VOCAB_GROWTH_SQL, ("TX1", "W2", "BONUS"),
              "Heaps'-law vocabulary-growth curve per source over nested "
              "md5 doc buckets: exact cumulative tokens/vocab, new-word "
              "ppm, vocab-per-Mtok — one corpus scan + vocab-sized "
              "aggregates, VG_BUCKETS-bounded windows vs the oracle's "
              "window-free correlated range self-joins"),
    QuerySpec("docs_bpe_vocab_coverage", PL.docs_bpe_vocab_coverage,
              PL.DOCS_BPE_VOCAB_COVERAGE_SQL, ("TX3", "A1", "BONUS"),
              "tokenizer-arc capstone: train BPE merges on a 4/5 doc "
              "split, profile the held-out fifth per source — token "
              "counts, true-OOV ppm (chars unseen in training), "
              "merged-symbol ppm, bytes-per-token; vocab-sized encode + "
              "broadcast join vs the oracle's recursive merge automaton "
              "applied to the held-out word table"),
    QuerySpec("parts_coorder_communities", G.parts_coorder_communities,
              G.PARTS_COORDER_COMMUNITIES_SQL, ("J1", "A4", "BONUS"),
              "community detection by fixed-round synchronous label "
              "propagation over the support-pruned co-order graph "
              "(argmax neighbor label via max_by(lab, (cnt, -lab)), "
              "ties to MIN; per-round localCheckpoint lineage clamp) vs "
              "the oracle's unrolled MATERIALIZED rounds with "
              "ROW_NUMBER argmax; emits size/min-member/internal-edges "
              "per community"),
    QuerySpec("parts_coorder_kcore", G.parts_coorder_kcore,
              G.PARTS_COORDER_KCORE_SQL, ("J1", "U3", "BONUS"),
              "2-core decomposition of the support-pruned co-order "
              "graph by fixed-round peel (restrict-edges + recount "
              "degrees per round, node-sized state) vs the oracle's "
              "unrolled MATERIALIZED n1..nL chain — the "
              "kmeans/BPE unrolling doctrine on a graph"),
    # r9: displaced from the window by their strict-superset suites
    # (relational_shapes_suite / docs_tokenizer_suite execute them
    # verbatim); still oracle-checked here.
    QuerySpec("regional_supplier_volume", R.regional_supplier_volume,
              R.REGIONAL_SUPPLIER_VOLUME_SQL, ("J1", "J5", "A1"),
              "TPC-H Q5 shape: 6-way broadcast-dim join (the reference's "
              "app-side hash-map join done as broadcast hash joins)"),
    QuerySpec("docs_simhash", D.docs_simhash, D.DOCS_SIMHASH_SQL,
              ("DD5",), "16-bit SimHash document signatures"),
    # r9 (r8 verdict task 6): the wallet-leaderboard -State/-Merge tier
    # as a REAL 3-microbatch file-source stream; also executed verbatim
    # in-window via streaming_state_suite's 'leaderboard' path.
    QuerySpec("streaming_leaderboard_1h", E.streaming_leaderboard_1h,
              E.STREAMING_LEADERBOARD_1H_SQL,
              ("ST1", "ST3", "ST4", "A7", "A8", "A3", "BONUS"),
              "hourly wallet-leaderboard partial states (count/sum "
              "volume/signed pnl/uniqExact-as-key-set markets at "
              "(bucket, wallet, market) grain) maintained by "
              "incremental_additive_stream across 3 genuine "
              "microbatches, -Merge read at (bucket, wallet) == the "
              "direct batch aggregation oracle"),
    # r9 beyond-ref additions — each executed verbatim in-window via a
    # suite path (xcorr/markov: events_series_suite; goodturing:
    # docs_tokenizer_suite).
    QuerySpec("events_type_xcorr", TS.events_type_xcorr,
              TS.EVENTS_TYPE_XCORR_SQL, ("A1", "W2", "BONUS"),
              "cross-type lead-lag correlation sufficient stats at lag "
              "0h/24h over the hourly cents series (pairs where both "
              "series have the hour): exact n/Σa/Σb/Σab/cov_num in "
              "DECIMAL(38,0); Spark's sparse shifted join vs the "
              "oracle's dense per-pair hour-spine LAG; Pearson r is a "
              "pure function of the stats (numpy-parity pytest)"),
    QuerySpec("events_type_transition_matrix",
              TS.events_type_transition_matrix,
              TS.EVENTS_TYPE_TRANSITION_MATRIX_SQL, ("W4", "A1", "BONUS"),
              "first-order Markov transition matrix of the per-user "
              "clickstream: per (prev, next) exact counts, row totals "
              "and integer-ppm probabilities; Spark per-user LAG window "
              "vs the oracle's quantifier adjacency (correlated "
              "NOT-EXISTS nothing-strictly-between)"),
    QuerySpec("docs_count_of_counts", D.docs_count_of_counts,
              D.DOCS_COUNT_OF_COUNTS_SQL, ("TX1", "A1", "BONUS"),
              "Good-Turing frequency-of-frequencies per source: N_r "
              "histogram of word counts, N_{r+1} lookup and the "
              "adjusted count r* = (r+1)N_{r+1}/N_r in exact "
              "milli-units — the smoothing input of Katz/simple-GT "
              "language models"),
    QuerySpec("events_ewma_control", TS.events_ewma_control,
              TS.EVENTS_EWMA_CONTROL_SQL, ("A1", "W2", "BONUS"),
              "integer EWMA control chart over the hourly cents series: "
              "m += (s - m) DIV 4 stays in exact integers (power-of-two "
              "alpha), residuals against the pre-update state; ONE "
              "F.aggregate fold per calendar-bounded series vs the "
              "oracle's literal recursive CTE; executed in-window as "
              "events_series_suite's 'ewma' path"),
    QuerySpec("events_day_bitmap_stats", TS.events_day_bitmap_stats,
              TS.EVENTS_DAY_BITMAP_STATS_SQL, ("A3", "A1", "BONUS"),
              "groupBitmap-analog day-mask aggregates: per-user BIGINT "
              "activity bitmask (bit_or of day bits), then per type the "
              "OR/AND merged masks, popcount coverage/common days and "
              "summed active days — the mergeable exact-set encoding "
              "for a bounded universe; executed in-window as "
              "events_series_suite's 'bitmap' path"),
    QuerySpec("events_cube_volume", E.events_cube_volume,
              E.EVENTS_CUBE_VOLUME_SQL, ("A1", "BONUS"),
              "CUBE grouping sets over (event_type, day_part) with "
              "grouping ids — the OLAP companion of regional_rollup's "
              "ROLLUP; exact integer cents; executed in-window as "
              "relational_shapes_suite's 'cube' path"),
    QuerySpec("events_daily_type_pivot", E.events_daily_type_pivot,
              E.EVENTS_DAILY_TYPE_PIVOT_SQL, ("A1", "A2", "BONUS"),
              "day x type volume PIVOT with an EXPLICIT value list (no "
              "collect-distinct pre-scan — the scale-correct form; "
              "static schema) vs the oracle's conditional-aggregation "
              "rewrite; executed in-window as relational_shapes_suite's "
              "'pivot' path"),
    QuerySpec("events_growth_accounting", E.events_growth_accounting,
              E.EVENTS_GROWTH_ACCOUNTING_SQL, ("A1", "W2", "BONUS"),
              "DAU growth accounting: every active (user, day) classed "
              "new/retained/resurrected by a per-user LAG window, churn "
              "charged to the day after via a shifted anti-join — vs "
              "the oracle's windowless EXISTS/NOT-EXISTS derivation of "
              "every class; executed in-window as events_series_suite's "
              "'growth' path"),
    QuerySpec("events_bag_setops", E.events_bag_setops,
              E.EVENTS_BAG_SETOPS_SQL, ("U3", "A1", "BONUS"),
              "EXCEPT ALL / INTERSECT ALL bag semantics over per-type "
              "user multisets — Spark's native exceptAll/intersectAll "
              "vs DuckDB's native bag operators, re-aggregated to "
              "(user, multiplicity); closed form max/min(p,c) asserted "
              "in pytest; executed in-window as events_series_suite's "
              "'bagops' path"),
    QuerySpec("streaming_sessions_windowed",
              E.streaming_sessions_windowed,
              E.STREAMING_SESSIONS_WINDOWED_SQL, ("ST5", "ST1", "BONUS"),
              "native session_window driven through a REAL watermarked "
              "3-microbatch stream in complete mode (cross-batch state "
              "merge) vs the gaps-and-islands oracle rewrite; NTZ->LTZ "
              "->NTZ round trip keeps the gate tz-safe; executed "
              "in-window as streaming_state_suite's 'sessions' path"),
    QuerySpec("streaming_stream_join_1h", E.streaming_stream_join_1h,
              E.STREAMING_STREAM_JOIN_1H_SQL, ("ST5", "ST1", "J6", "BONUS"),
              "watermarked stream-stream interval join (views x "
              "purchases within 1h), both sides real chunked streams — "
              "state bounded by the watermark horizon — vs the batch "
              "interval-join oracle; executed in-window as "
              "streaming_state_suite's 'ssjoin' path"),
    QuerySpec("docs_source_overlap", D.docs_source_overlap,
              D.DOCS_SOURCE_OVERLAP_SQL, ("TX7", "DD2", "BONUS"),
              "cross-source 3-gram overlap matrix (between-source "
              "leakage): md5-keyed distinct gram sets, pair join "
              "bounded per gram by the source count, containment ppm "
              "vs the smaller side; executed in-window as "
              "docs_tokenizer_suite's 'overlap' path"),
    QuerySpec("schema_evolution_read", O.schema_evolution_read,
              O.SCHEMA_EVOLUTION_READ_SQL, ("S3", "P9", "BONUS"),
              "mergeSchema ingest across batch generations: an old "
              "batch written without a column + a new batch with it, "
              "read back merged (missing values NULL) and aggregated — "
              "vs the oracle replaying the generation rule over the "
              "base table"),
    QuerySpec("customer_snm_pairs", PL.customer_snm_pairs,
              PL.CUSTOMER_SNM_PAIRS_SQL, ("DD5", "W4", "BONUS"),
              "multi-pass sorted-neighborhood ER blocking (name-sorted "
              "+ reversed-name-sorted passes, w=3, bounded per-block "
              "rank windows, exploded-offset equi-join) with exact "
              "levenshtein verify and a recall audit against the "
              "lossless FastSS truth set; oracle ranks the same passes "
              "and derives truth from the numeric no-carry "
              "characterization"),
    QuerySpec("docs_dsir_selection", PL.docs_dsir_selection,
              PL.DOCS_DSIR_SELECTION_SQL, ("TX5", "W4", "BONUS"),
              "DSIR-style data selection: hashed-bigram (4096-bucket) "
              "target-vs-raw ppm distributions (target = lang 'en'), "
              "per-doc integer importance score, top-100 selection via "
              "a collected value threshold (no global rank window); "
              "linear log-free surrogate score (see DIVERGENCES.md) vs "
              "a DuckDB window-rank oracle"),
    QuerySpec("docs_bloom_dedup", D.docs_bloom_dedup,
              D.DOCS_BLOOM_DEDUP_SQL, ("DD1", "A3", "BONUS"),
              "Bloom-filter membership pre-filter for snapshot dedup: "
              "m=6 bits/element, k=4 md5 hash functions built from an "
              "md5-drawn member half, gated on the deterministic "
              "register state (per-64-bit-word set-bit counts), sizing "
              "params, and the per-source probe audit (false positives "
              "populated at every SF, false negatives structurally 0); "
              "broadcast-state design — probes never shuffle"),
    QuerySpec("docs_k_anonymity", PL.docs_k_anonymity,
              PL.DOCS_K_ANONYMITY_SQL, ("TX1", "A1", "BONUS"),
              "the full privacy-release triad over (source, lang, "
              "length bucket) quasi-identifiers: k-anonymity via a "
              "4-level Mondrian-style generalization ladder (K=5), "
              "l-diversity (distinct-class count + modal-class ppm of "
              "an md5-injected sensitive label — homogeneity attack), "
              "and t-closeness (exact integer-ppm ordered-EMD of the "
              "group's class CDF vs the corpus CDF — skewness attack); "
              "groupBy+broadcast-join ladder + one-pass conditional "
              "CDF sums vs a window-count + DISTINCT oracle"),
]

REGISTRY: dict[str, QuerySpec] = {s.name: s for s in _SPECS}


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
