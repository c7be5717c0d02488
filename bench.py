"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line to stdout:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (forces every
exchange/aggregation, writes nothing). Per BASELINE.md the contract is
steady-state throughput, not cold-start latency: each query is warmed
once (codegen compilation, parquet footers) and the reported number is
the best of three subsequent measured runs (round 4 raised this from
two: round-3 cross-round deltas up to ±70% on sub-second queries with
unchanged code showed min-of-2 in a shared 33-query JVM is noisier than
the ±15% BASELINE note assumes).

The apples-to-apples index build vs BASELINE.md is measured FIRST,
before the 33 headline queries touch the JVM — round 3 measured it last
and recorded +34% on unchanged code; JVM state accumulated across ~1500
stages (code cache, old-gen pressure, broadcast cleanup backlog) is the
suspected cause, and measuring first removes that term entirely.

ACCOUNTING CHANGE (round 4): the timer now starts BEFORE the builder
call, so plan construction and any builder-side staging jobs
(localCheckpoint) are counted. Numbers from BENCH_r01-r03 under-report
queries that stage subtrees (q_near_dup's recorded 0.02 s was really
~3.8 s); r4+ totals are the comparable baseline going forward — see
PLANS.md "Honest-timer bench".

ACCOUNTING CHANGE (round 8): the graph-ANN family reports BUILD and
PROBE separately (round-7 verdict item 3). Cold per-run measurement of
q_ann_hnsw / q_ann_graph / their recall+serving twins re-paid the full
index build every run (~8-11 s each), so the recorded numbers read as
query latency when ~90% was construction. Now `q_ann_graph_build` /
`q_ann_hnsw_build` / `q_ann_serving_build` time the cold index
construction, and the family's query entries are WARM probes over the
staged index — the production build-once/probe-many shape. r8+ totals
therefore drop by the removed duplicate builds; cross-round
comparisons for these keys must use BENCH_DETAIL medians with this
note in mind.

ACCOUNTING CHANGE (round 10): near-duplicate families rotate — ONE
member of each SECONDARY_FAMILIES group is measured per round — and
the stdout "value" sums only the NEVER-ROTATED entries, so it stays
comparable round-over-round regardless of rotation phase. The full
measured sum is BENCH_DETAIL's "total_measured"; rotated-out names
are listed there explicitly.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_postings",          # the reference's whole pipeline (flagship)
    "q_sorted_index",      # + letter partition & order
    "q_bm25",              # ranking over the index (what it's for)
    "q_agg_pricing_summary",  # TPC-H Q1 shape
    "q_join_orders_customer",  # broadcast 3-way join
    "q_join_5way",         # TPC-H Q5 shape: 6-way join
    "q_window_topn",       # window rank
    "q_events_tumbling",   # time windows
    "q_asof_join",         # as-of join (union + keyed window)
    "q_dedup_exact",       # LLM pipeline: exact dedup
    "q_near_dup",          # LLM pipeline: minhash LSH + verify
    "q_embed_dup",         # LLM pipeline: embedding-cosine dedup (IVF-blocked)
    "q_tfidf",             # LLM pipeline: text analysis
    "q_curation_pipeline",  # LLM pipeline: 4-stage curation composite
    "q_cosine_topk",       # LLM pipeline: similarity search
    "q_ann_ivf",           # LLM pipeline: IVF-pruned ANN
    "q_ann_filtered_ivf",  # filtered ANN: predicate ∩ probed cells + fallback
    "q_top_orders",        # TPC-H Q3 shape: join-agg top-k
    "q_multi_rollup",      # hierarchical time rollup (minute->hour->day)
    "q_repetition",        # LLM pipeline: intra-doc repetition gate
    "q_rp_lsh",            # LLM pipeline: SRP cosine LSH candidates
    "q_disjunctive_join",  # TPC-H Q19 shape: OR-of-ANDs pushdown
    "q_waiting_suppliers",  # TPC-H Q21 shape: agg-rejoin double-exists
    "q_countmin",          # count-min sketch build + heavy-hitter probe
    "q_gram_matrix",       # X^T X reduction over embeddings
    "q_rolling_distinct",  # sliding 7-day DISTINCT (spine band join)
    "q_bpe_pairs",         # BPE adjacent-pair frequencies
    "q_hll",               # HyperLogLog distinct sketch (bit-replayed)
    "q_bloom",             # Bloom-filter membership with FP audit
    "q_priority_late",     # TPC-H Q4 shape: correlated-EXISTS semi join
    "q_lm_score",          # LLM pipeline: bigram-LM perplexity-filter shape
    "q_ann_batch",         # LLM pipeline: batched IVF ANN (probe set)
    "q_multimodal_ppm",    # Arrow-batched REAL image decode (PPM)
    "q_multimodal_wav",    # Arrow-batched REAL audio decode (RIFF/WAVE PCM)
    "q_substring_dup",     # LLM pipeline: ExactSubstr window-hash dedup
    "q_zorder_layout",     # Z-order clustering bucket extents
    "q_volume_shipping",   # TPC-H Q7 shape: bilateral nation-pair volume
    "q_bpe_train",         # full greedy BPE train (3 merge rounds, one lazy plan)
    "q_semantic_dedup",    # SemDeDup: trained clusters + within-cell prune
    "q_postings_compress",  # delta+varint posting encode (Arrow, narrow)
    "q_postings_unmerge",  # incremental index downdate (GDPR retraction)
    "q_index_cdc",         # CDC round: downdate + merge ≡ full rebuild
    "q_weighted_sample",   # ticket-replication weighted sample (1 exchange)
    "q_diverse_sample",    # greedy k-center diversity selection (m passes)
    "q_winnowing",         # MOSS winnowing fingerprints + sharing join
    "q_product_profit",    # TPC-H Q9 shape: profit rollup, 5-table join
    "q_dsir_weights",      # DSIR importance weights (hashed-bigram models)
    "q_power_iteration",   # PCA direction: gram reduction + K mat-vec rounds
    "q_sparse_cosine",     # TF-IDF all-pairs cosine via inverted-index join
    "q_triangles",         # triangle counts over co-occurrence graph
    "q_variant_events",    # Spark 4 VARIANT parse + typed path extraction
    "q_hll_merge",         # open-box HLL partial-merge contract
    "q_pmi",               # PMI collocations over pruned co-occurrence
    "q_lm_retrieval",      # query-likelihood ranking (Dirichlet LM)
    "q_udtf_topterms",     # Arrow Python UDTF lateral expansion
    "q_rp_lsh_scaled",     # SRP LSH with live production dials (banded)
    "q_embed_dup_scaled",  # IVF dedup with corpus-scaled cell count
    "q_multimodal_png",    # Arrow-batched REAL PNG decode (zlib inflate + unfilter)
    "q_knn_graph_scaled",  # KNN graph with corpus-scaled IVF cells
    "q_ann_recall",        # recall@10 audit: IVF vs exact brute force
    "q_hybrid_rrf",        # BM25 + cosine reciprocal-rank fusion
    "q_prefix_trie",       # native WITH RECURSIVE dictionary trie
    "q_arrow_token_stats",  # mapInArrow raw-batch token statistics
    "q_wordpiece_encode",  # WordPiece longest-match inference (recursive walk)
    "q_pq_ann",            # product-quantization ANN (ADC over code relation)
    "q_interval_join",     # bin-bucketed interval overlap join
    "q_multimodal_gif",    # Arrow-batched REAL GIF decode (own LZW)
    "q_shortest_path",     # frontier BFS over co-occurrence graph
    "q_table_versions",    # transactional table commit/append/time travel
    "q_unigram_lm",        # unigram-LM tokenizer EM round (unrolled Viterbi DP)
    "q_postings_ef",       # Elias-Fano posting layout vs varint ledger
    "q_bm25_pruned",       # MaxScore-style bound-pruned exact BM25
    "q_ivfpq_ann",         # IVF cells x PQ codes composite ANN
    "q_semantic_dedup_scaled",  # SemDeDup with corpus-scaled cluster count
    "q_semantic_dedup_2level",  # + two-level (IVF-on-IVF) assignment
    "q_table_compact",     # table-format compaction (3 dirs -> 1)
    "q_table_skipping",    # manifest-stats data skipping (ranged read)
    "q_table_delete",      # copy-on-write ranged delete (stats-pruned rewrite)
    "q_table_merge",       # storage-integrated MERGE (stats-pruned upsert)
    "q_table_merge_mor",   # merge-on-read MERGE (position vectors + append)
    "q_table_cdc_mor",     # merge-on-read CDC apply (shared MOR path)
    "q_table_merge_eq",    # equality-delete upsert (O(batch), zero base reads)
    "q_table_delete_eq",   # equality delete by key set (same tier)
    "q_table_bloom_skip",  # bloom point-lookup skipping (unclustered keys)
    "q_table_changes",     # append-only change feed (incremental consumer)
    "q_table_cluster",     # range-clustered compaction repairs skipping
    "q_table_skipping_multi",  # AND-of-ranges multi-column pruning
    "q_table_delete_dv",   # merge-on-read delete via position vectors
    "q_table_wap",         # write-audit-publish branch + tag pin
    "q_ingest_dedup",      # incremental dedup vs persisted signature state
    "q_table_stream",      # table commit log as a streaming source
    "q_table_zorder",      # OPTIMIZE ZORDER BY: two-axis bucket pruning
    "q_table_mv",          # incremental materialized view over commit log
    "q_table_constraints",  # CHECK constraints gating every write
    "q_table_fast_agg",    # metadata-only COUNT/MIN/MAX pushdown
    "q_table_history",     # DESCRIBE HISTORY from manifests alone
    "q_boilerplate_removal",  # C4 span rule: shared-passage repair
    "q_table_cdc",         # CDC apply with tombstones (full MERGE shape)
    "q_vocab_coverage",    # top-K vocabulary coverage / UNK-rate curve
    "q_ingest_wap",        # ingest dedup staged/audited/published (WAP)
    "q_vocab_oov",         # tokenizer serving loop: persisted vocab, OOV on B
    "q_table_restore",     # version rollback as a forward manifest commit
    "q_quality_classifier",  # Rocchio-trained model-based quality filter
    "q_quality_holdout",   # its train/test generalization audit
    "q_table_hidden_partition",  # day-transform layout, source-col pruning
    "q_table_partition_evolution",  # day->month spec change, per-spec prune
    "q_table_bucket_partition",  # bucket[8] layout, 1-dir point lookup
    "q_term_serving_table",  # postings served via bucket[16] point reads
    "q_train_shuffle",     # deterministic shard + within-shard order
    "q_table_mv_join",     # join IVM: delta-join refresh from two logs
    "q_table_retention",   # partition-aligned expiry: drop interior days
    "q_table_diff",        # version diff, common dirs pruned exactly
    "q_table_clone",       # shallow clone: zero-copy fork + divergence
    "q_table_maintenance",  # metadata-only maintenance advisor
    "q_table_analyze",     # stats backfill reads only stats-less dirs
    "q_table_unique",      # enforced unique key, range-pruned probe
    "q_table_group",       # multi-table consistent snapshot pin sets
    "q_group_stream",      # streaming ingest with per-batch group pins
    "q_embedding_drift",   # per-label centroid drift between halves
]

# The graph-ANN family is benched build/probe SPLIT (round-7 verdict
# item 3): a cold measurement of these queries re-times the index
# build per run — 10 s numbers that read as query latency when the
# production shape is build-once/probe-many. Each family below gets
# one explicit `*_build` entry (cold index construction) and warm
# probe entries (steady() with cold=False: the warm-ups pay any
# staging, the measured runs are pure walk/audit).
ANN_GRAPH_PROBES = [
    "q_ann_graph",         # NSW graph-ANN best-first beam search
    "q_ann_graph_filtered",  # filtered graph-ANN, per-probe sound fallback
    "q_ann_graph_recall",  # graph-ANN recall@5 contract vs brute force
]
ANN_HNSW_PROBES = [
    "q_ann_hnsw",          # HNSW: 3-layer hierarchical graph-ANN search
    "q_ann_hnsw_recall",   # HNSW recall@5 contract vs brute force
    "q_ann_external",      # serving path: external query vectors over HNSW
    "q_ann_external_filtered",  # serving + predicate + per-probe fallback
    "q_ann_external_recall",  # serving-path recall@5 contract
    "q_ann_hnsw_scaled",   # HNSW with live production dials (broadcast)
    "q_ann_serving_table",  # serving walk over the PERSISTED table index
    "q_ann_serving_filtered",  # persisted index + predicate + fallback
]

# ROTATING SECONDARY TIER (round-9 verdict item 7): same-family
# near-duplicates measure ONE member per round instead of all — the
# full detail set had grown to ~4 min of pure bench wall per run. The
# rotation index derives from the number of recorded BENCH_r*.json
# artifacts (deterministic per round, no clock), so each member is
# re-measured every len(family) rounds and cross-round comparisons
# use the common set as before. Rotated-out names are recorded
# EXPLICITLY in BENCH_DETAIL ("rotated_out") — a silently missing key
# would read as "covered" when it wasn't.
SECONDARY_FAMILIES = {
    "semantic_dedup": [
        "q_semantic_dedup",
        "q_semantic_dedup_scaled",
        "q_semantic_dedup_2level",
    ],
    "filtered_ann": [
        "q_ann_filtered_ivf",
        "q_ann_graph_filtered",
        "q_ann_external_filtered",
        "q_ann_serving_filtered",
    ],
    "multimodal_decode": [
        "q_multimodal_ppm",
        "q_multimodal_wav",
        "q_multimodal_png",
        "q_multimodal_gif",
    ],
    # recall@k audits: one brute-force-vs-index contract, four indexes
    "ann_recall": [
        "q_ann_recall",
        "q_ann_graph_recall",
        "q_ann_hnsw_recall",
        "q_ann_external_recall",
    ],
    # default dials vs production ("_scaled") dials of the same operator
    "rp_lsh": ["q_rp_lsh", "q_rp_lsh_scaled"],
    "embed_dup": ["q_embed_dup", "q_embed_dup_scaled"],
    # stats-pruning variants over the same manifest machinery
    "table_skipping": ["q_table_skipping", "q_table_skipping_multi"],
    # copy-on-write vs merge-on-read of the same ranged delete
    "table_delete": [
        "q_table_delete",
        "q_table_delete_dv",
        "q_table_delete_eq",
    ],
    # copy-on-write vs merge-on-read of the same latest-wins upsert
    "table_merge": [
        "q_table_merge",
        "q_table_merge_mor",
        "q_table_merge_eq",
    ],
    # copy-on-write vs merge-on-read of the same tombstone CDC batch
    "table_cdc": ["q_table_cdc", "q_table_cdc_mor"],
    # partition-spec layouts: transform / evolution / bucket
    "partition_spec": [
        "q_table_hidden_partition",
        "q_table_partition_evolution",
        "q_table_bucket_partition",
    ],
    # incremental view maintenance: single-log vs delta-join refresh
    "table_mv": ["q_table_mv", "q_table_mv_join"],
    # version-fork ops on the same manifest chain
    "version_fork": ["q_table_clone", "q_table_diff", "q_table_restore"],
    # metadata-only caretakers
    "table_care": ["q_table_maintenance", "q_table_analyze"],
    # vocabulary audits over the same trained tokenizer
    "vocab": ["q_vocab_coverage", "q_vocab_oov"],
    # write-audit-publish: bare table op vs the ingest composite
    "wap": ["q_table_wap", "q_ingest_wap"],
}


# Canary normalization (round-11 verdict item 3): cross-round bench
# deltas were costing a manual isolated A/B session per round to tell
# ambient JVM/session drift from real regressions (the r4 postmortem's
# +-16-30% band; r8-r11 spikes all A/B'd to noise). The canaries are
# four cheap, never-rotated, untouched-plan entries spanning shapes
# (agg-heavy flagship, sketch, filter-probe, vector). session_factor =
# median(this_run[c] / CANARY_REF[c]) estimates THIS session's ambient
# speed vs the reference epoch; queries_normalized divides every entry
# by it so a uniform session drift cancels to ~1.0x and only
# query-specific movement stands out. Reference epoch: the round-11
# BENCH_DETAIL session (re-pin deliberately, with a note here, if the
# machine or measurement method ever changes).
CANARY_REF = {
    "q_postings": 0.607,
    "q_hll": 1.002,
    "q_bloom": 0.682,
    "q_sparse_cosine": 1.025,
}


def canary_block(times: dict) -> dict:
    """The normalization block written to BENCH_DETAIL: per-canary
    ratios, the median session_factor, and every measured entry's
    factor-normalized time. Falls back to factor 1.0 (flagged) if a
    canary ever goes missing from the measured set."""
    ratios = {
        c: round(times[c] / ref, 3)
        for c, ref in CANARY_REF.items()
        if c in times
    }
    if len(ratios) == len(CANARY_REF):
        s = sorted(ratios.values())
        factor = round((s[1] + s[2]) / 2, 3)  # median of 4
        missing = []
    else:
        factor = 1.0
        missing = sorted(set(CANARY_REF) - set(ratios))
    return {
        "ref_round": 11,
        "ratios": ratios,
        "session_factor": factor,
        **({"missing_canaries": missing} if missing else {}),
        "normalized": {
            k: round(v / max(factor, 1e-9), 3) for k, v in times.items()
        },
    }


def _bench_rotation() -> int:
    """Deterministic per-round rotation: the max round number among the
    recorded driver bench artifacts (this round's file doesn't exist
    while the bench runs). Derived from the round NUMBERS, not the file
    count, so an untracked just-recorded artifact or a missing early
    round can't silently shift the phase between a clean clone and the
    dev tree (round-10 advice)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    ]
    return max(rounds, default=0)


def rotated_out_queries() -> set[str]:
    """Family members NOT measured this round (everything but the
    rotation pick of each family)."""
    rot = _bench_rotation()
    out: set[str] = set()
    for fam in SECONDARY_FAMILIES.values():
        keep = fam[rot % len(fam)]
        out.update(n for n in fam if n != keep)
    return out


def stable_total(times: dict) -> float:
    """The rotation-invariant headline total: sum over entries that are
    in NO secondary family, so the stdout "value" never moves with
    rotation phase (round-10 accounting change — see module docstring)."""
    rotating = {n for fam in SECONDARY_FAMILIES.values() for n in fam}
    return round(sum(v for k, v in times.items() if k not in rotating), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from mapreduceindexer_spark.catalog import QUERIES
    from mapreduceindexer_spark.session import get_spark

    spark = get_spark(app_name="mapreduceindexer_spark-bench")

    from mapreduceindexer_spark import staging

    def run(name: str, cold: bool = True) -> float:
        # The timer covers BUILDER + action: builders are normally pure
        # plan construction (ms), but operators that stage a
        # multi-referenced subtree (localCheckpoint in q_semantic_dedup,
        # q_power_iteration, q_bpe_*, q_triangles) run real jobs inside
        # the builder — timing only the sink would let that work escape
        # the measurement (caught in round 4: q_power_iteration "ran"
        # 0.3 s on 100x the embeddings because the gram build was
        # builder-side). cold=True clears the session staging registry
        # so memoized relations (near-dup pairs) re-pay their build every
        # run — otherwise warm re-runs of a staged query would measure a
        # cache read, the same accounting mirage the builder-inclusive
        # timer exists to prevent.
        if cold:
            staging.clear()
        t0 = time.perf_counter()
        df = QUERIES[name][0](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    def steady(name: str, cold: bool = True) -> tuple[float, float]:
        # TWO warm-ups: a controlled A/B/A experiment (PLANS.md, round 4)
        # showed the JIT needs several executions of a query's generated
        # code to reach steady state — one warm-up under-warms by ~25%
        # on the heaviest pipelines. Returns (best, median) of three
        # measured runs: best is the steady-state contract number; the
        # median makes cross-round deltas attributable (a best far below
        # the median flags in-run noise, not a code change).
        run(name, cold)
        run(name, cold)
        samples = sorted(run(name, cold) for _ in range(3))
        return samples[0], samples[1]

    times = {}
    medians = {}

    # Apples-to-apples vs BASELINE.md, measured FIRST (see module
    # docstring): full index build (manifest corpus -> postings -> 26
    # sorted letter files) on the reference's own 6.4 MB / 355-file
    # corpus. Reference: 1.53 s sequential, 0.71 s at (M,R)=(4,4).
    ref_checker = "/root/reference/checker"
    if os.path.isdir(os.path.join(ref_checker, "test_in")):
        import tempfile

        from mapreduceindexer_spark.operators.index import build_postings
        from mapreduceindexer_spark.operators.sink import write_index
        from mapreduceindexer_spark.sources.corpus import read_manifest_corpus

        # Rebalance before caching: the file-packing scan bins 355 small
        # files into ~30 uneven splits; an even row spread keeps every
        # downstream stage's tasks uniform.
        corpus = (
            read_manifest_corpus(
                spark, os.path.join(ref_checker, "test.txt"), base_dir=ref_checker
            )
            .repartition(spark.sparkContext.defaultParallelism)
            .persist()
        )
        corpus.count()

        # Unsalted: a cost-based plan choice, not a shortcut. The hottest
        # term here appears in 343 of 355 documents — a 343-element posting
        # set is trivially one task's work, so the two-level salted
        # aggregation would only add an exchange (+25-30% wall, isolated
        # A/B in PLANS.md round 4). salt_buckets is the 100 TB skew knob,
        # exercised by q_postings (driver-checked) and load-tested at 500 k
        # docs in tests/test_scale_stress.py.
        def build() -> float:
            out = tempfile.mkdtemp(prefix="refidx_bench_")
            t0 = time.perf_counter()
            write_index(build_postings(corpus), out)
            return time.perf_counter() - t0

        build()  # warm-up ×2 (see steady())
        build()
        times["index_build_refcorpus"] = round(min(build(), build(), build()), 3)
        corpus.unpersist()

    rotated_out = rotated_out_queries()

    for name in HEADLINE:
        if name in rotated_out:
            continue
        best, med = steady(name)
        times[name] = round(best, 3)
        medians[name] = round(med, 3)

    # Graph-ANN family, build/probe split (round-7 verdict item 3).
    # Build = cold construction of the staged index relation (each
    # measured run clears the staging registry and re-pays the full
    # edge build); probe = the walk/audit over the warm index (the
    # production serving shape — q_ann_graph_recall_staged proved the
    # warm path at 2.35 s while the cold entry read 8 s).
    from mapreduceindexer_spark.catalog import (
        _hnsw_edges_staged,
        _nsw_edges_staged,
    )

    def steady_build(build_fn) -> tuple[float, float]:
        def one() -> float:
            staging.clear()
            t0 = time.perf_counter()
            build_fn()
            return time.perf_counter() - t0

        one()
        one()
        samples = sorted(one() for _ in range(3))
        return samples[0], samples[1]

    for key, build_fn, probes in (
        ("q_ann_graph_build", lambda: _nsw_edges_staged(spark, sf_dir),
         ANN_GRAPH_PROBES),
        ("q_ann_hnsw_build", lambda: _hnsw_edges_staged(spark, sf_dir),
         ANN_HNSW_PROBES),
    ):
        best, med = steady_build(build_fn)
        times[key] = round(best, 3)
        medians[key] = round(med, 3)
        build_fn()  # leave the index warm for the probes
        for name in probes:
            if name in rotated_out:
                continue
            best, med = steady(name, cold=False)
            times[name] = round(best, 3)
            medians[name] = round(med, 3)

    # The table-persist half of the serving index (commit +
    # range-clustered rewrite of the warm edge relation) — the
    # storage-side build cost, separate from the edge construction.
    import shutil as _shutil
    import tempfile as _tempfile

    from mapreduceindexer_spark.operators import similarity as _sim
    from mapreduceindexer_spark.sources.transact import TransactionalTable

    def persist_once() -> None:
        path = _tempfile.mkdtemp(prefix="bench_hnsw_idx_")
        try:
            _sim.persist_graph_index(
                spark, _hnsw_edges_staged(spark, sf_dir),
                TransactionalTable(path), n_buckets=8,
            )
        finally:
            _shutil.rmtree(path, ignore_errors=True)

    def persist_timed() -> float:
        t0 = time.perf_counter()
        persist_once()
        return time.perf_counter() - t0

    persist_once()
    persist_once()
    _samples = sorted(persist_timed() for _ in range(3))
    times["q_ann_serving_build"] = round(_samples[0], 3)
    medians["q_ann_serving_build"] = round(_samples[1], 3)

    # Staged-reuse variant of the curation composite: the near-dup pair
    # relation is already materialized in the session staging registry
    # (as it is whenever a sibling query built it first — the production
    # staging-table pattern), so the composite pays only its unique
    # stages. Reported as its own key, never mixed into the cold number.
    from mapreduceindexer_spark.catalog import _near_pairs_staged

    # Headline total is frozen BEFORE the staged variant: it sums the
    # index build + the cold headline queries only (the staged number
    # is additional information, not a substitute for the cold
    # composite).
    # ACCOUNTING CHANGE (round 10): "value" sums ONLY the entries that
    # are NEVER rotated (no SECONDARY_FAMILIES member) — a total over
    # the per-round-varying measured set would oscillate with rotation
    # phase (e.g. 5.5 s q_semantic_dedup_2level in one round vs 3.3 s
    # q_semantic_dedup the next) and read as perf change on unchanged
    # code. The full measured sum still ships in BENCH_DETAIL as
    # "total_measured"; cross-round family comparisons use per-query
    # detail medians as ever.
    total = stable_total(times)

    staging.clear()
    _near_pairs_staged(spark, sf_dir)  # stage once, outside the timer
    best, med = steady("q_curation_pipeline", cold=False)
    times["q_curation_pipeline_staged"] = round(best, 3)
    medians["q_curation_pipeline_staged"] = round(med, 3)

    # Same pattern for the graph-ANN index: edges built once per session
    # (the production index-build), recall audit pays only the walk.
    from mapreduceindexer_spark.catalog import _nsw_edges_staged

    _nsw_edges_staged(spark, sf_dir)  # stage once, outside the timer
    best, med = steady("q_ann_graph_recall", cold=False)
    times["q_ann_graph_recall_staged"] = round(best, 3)
    medians["q_ann_graph_recall_staged"] = round(med, 3)

    # Drift probe: re-measure the first headline query at the END of the
    # run. BENCH artifacts are recorded in a shared JVM whose state
    # accumulates across ~1500 stages; the end/start ratio quantifies
    # that drift IN the artifact so cross-round deltas are attributable
    # without a postmortem (round-4 finding: +30-60% on unchanged code).
    drift_end, _ = steady(HEADLINE[0])
    drift = {
        "query": HEADLINE[0],
        "start_sec": times[HEADLINE[0]],
        "end_sec": round(drift_end, 3),
        "ratio": round(drift_end / max(times[HEADLINE[0]], 1e-9), 3),
    }

    # Full per-query detail (medians + drift probe) goes to a side file:
    # the driver that records BENCH_r{N}.json keeps only the LAST 2000
    # characters of combined output and parses the JSON line out of that
    # window. Round 5 learned this the hard way — inlining
    # queries_median + jvm_drift pushed the line to ~4 kB and the driver
    # recorded "parsed": null, i.e. NO bench numbers for the round. The
    # stdout line is therefore emitted compact (no spaces), with a hard
    # length guard, AFTER spark.stop() so no shutdown log lines can push
    # it out of the tail window.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_median": medians,
                "jvm_drift": drift,
                "canary": canary_block(times),
                "rotated_out": sorted(rotated_out),
                "rotation": _bench_rotation(),
                # Computed HERE, after the staged variants land, so it
                # always equals sum(queries.values()) in this file —
                # a frozen-early copy left a 2.7 s unexplained gap
                # (review finding).
                "total_measured": round(sum(times.values()), 3),
                "sf": sf,
            },
            fh,
            indent=1,
        )
        fh.write("\n")

    line = emit_line(total, times, sf)
    spark.stop()
    print(line)


# Stable one-line truncation priority (round-13, VERDICT r12 item 5):
# when the driver line would exceed its 2000-char tail window, entries
# used to be dropped FASTEST-FIRST BY THIS RUN'S TIMING, so the set the
# driver could track round-over-round churned with every run's noise
# (PERF_r12 reported 10 spurious "dropped_from_bench"). The drop order
# is now pinned to a FROZEN per-entry cost snapshot (max of the r11
# driver line, the r12 driver line and the r12 close-run detail), so
# the kept set is a deterministic function of the measured-entry set
# alone: cheapest PINNED cost drops first, names absent from the pin
# (entries born after r12) never drop before pinned ones, ties break
# by name. BENCH_DETAIL.json always carries the full set.
_EMIT_KEEP_COST = {
    "index_build_refcorpus": 1.362,
    "q_agg_pricing_summary": 1.058,
    "q_ann_batch": 0.514,
    "q_ann_external": 1.934,
    "q_ann_external_filtered": 1.902,
    "q_ann_external_recall": 1.926,
    "q_ann_filtered_ivf": 0.565,
    "q_ann_graph": 1.48,
    "q_ann_graph_build": 4.44,
    "q_ann_graph_recall_staged": 1.73,
    "q_ann_hnsw": 1.931,
    "q_ann_hnsw_build": 6.129,
    "q_ann_hnsw_recall": 2.252,
    "q_ann_hnsw_scaled": 1.725,
    "q_ann_ivf": 0.469,
    "q_ann_recall": 0.694,
    "q_ann_serving_build": 1.019,
    "q_ann_serving_filtered": 2.723,
    "q_ann_serving_table": 2.027,
    "q_arrow_token_stats": 0.273,
    "q_asof_join": 0.815,
    "q_bloom": 0.448,
    "q_bm25": 0.564,
    "q_bm25_pruned": 0.977,
    "q_boilerplate_removal": 1.465,
    "q_bpe_pairs": 0.334,
    "q_bpe_train": 1.002,
    "q_cosine_topk": 0.245,
    "q_countmin": 0.379,
    "q_curation_pipeline": 4.584,
    "q_curation_pipeline_staged": 1.2,
    "q_dedup_exact": 0.181,
    "q_disjunctive_join": 0.604,
    "q_diverse_sample": 1.914,
    "q_dsir_weights": 1.222,
    "q_embed_dup": 1.022,
    "q_embed_dup_scaled": 1.88,
    "q_embedding_drift": 0.892,
    "q_events_tumbling": 0.366,
    "q_gram_matrix": 1.139,
    "q_group_stream": 3.381,
    "q_hll": 1.741,
    "q_hll_merge": 1.796,
    "q_hybrid_rrf": 0.929,
    "q_index_cdc": 1.074,
    "q_ingest_dedup": 4.499,
    "q_ingest_wap": 4.494,
    "q_interval_join": 0.476,
    "q_ivfpq_ann": 1.001,
    "q_join_5way": 1.592,
    "q_join_orders_customer": 0.522,
    "q_knn_graph_scaled": 3.681,
    "q_lm_retrieval": 1.157,
    "q_lm_score": 1.105,
    "q_multi_rollup": 0.498,
    "q_multimodal_ppm": 0.296,
    "q_near_dup": 3.726,
    "q_pmi": 0.927,
    "q_postings": 0.509,
    "q_postings_compress": 0.541,
    "q_postings_ef": 0.451,
    "q_postings_unmerge": 0.561,
    "q_power_iteration": 2.262,
    "q_pq_ann": 0.588,
    "q_prefix_trie": 0.278,
    "q_priority_late": 0.715,
    "q_product_profit": 1.465,
    "q_quality_classifier": 1.365,
    "q_quality_holdout": 1.333,
    "q_repetition": 0.487,
    "q_rolling_distinct": 0.438,
    "q_rp_lsh": 1.004,
    "q_rp_lsh_scaled": 1.169,
    "q_semantic_dedup": 3.047,
    "q_semantic_dedup_2level": 5.392,
    "q_semantic_dedup_scaled": 3.255,
    "q_shortest_path": 2.133,
    "q_sorted_index": 0.523,
    "q_sparse_cosine": 1.025,
    "q_substring_dup": 1.05,
    "q_table_analyze": 1.12,
    "q_table_bloom_skip": 2.451,
    "q_table_cdc": 2.672,
    "q_table_cdc_mor": 2.178,
    "q_table_changes": 1.693,
    "q_table_clone": 1.625,
    "q_table_cluster": 2.064,
    "q_table_compact": 1.261,
    "q_table_constraints": 1.438,
    "q_table_delete": 2.109,
    "q_table_delete_eq": 1.889,
    "q_table_diff": 2.247,
    "q_table_fast_agg": 2.399,
    "q_table_group": 2.391,
    "q_table_hidden_partition": 0.853,
    "q_table_history": 1.922,
    "q_table_maintenance": 1.769,
    "q_table_merge": 3.147,
    "q_table_merge_eq": 2.093,
    "q_table_mv": 1.983,
    "q_table_mv_join": 2.722,
    "q_table_partition_evolution": 2.466,
    "q_table_restore": 1.413,
    "q_table_retention": 4.12,
    "q_table_skipping": 1.549,
    "q_table_skipping_multi": 1.289,
    "q_table_stream": 2.976,
    "q_table_unique": 2.548,
    "q_table_versions": 1.128,
    "q_table_wap": 2.57,
    "q_table_zorder": 3.451,
    "q_term_serving_table": 1.645,
    "q_tfidf": 0.659,
    "q_top_orders": 1.067,
    "q_train_shuffle": 0.182,
    "q_triangles": 1.253,
    "q_udtf_topterms": 0.473,
    "q_unigram_lm": 3.794,
    "q_variant_events": 0.311,
    "q_vocab_coverage": 0.527,
    "q_vocab_oov": 2.851,
    "q_volume_shipping": 0.684,
    "q_waiting_suppliers": 1.366,
    "q_weighted_sample": 0.201,
    "q_window_topn": 0.371,
    "q_winnowing": 1.84,
    "q_wordpiece_encode": 1.269,
    "q_zorder_layout": 1.097,
}


def emit_line(total: float, times: dict, sf: float, limit: int = 1900) -> str:
    """One-line JSON for the driver, guaranteed under `limit` chars.

    If the queries dict would overflow the driver's 2000-char tail
    window, the fastest queries are dropped from the LINE (never from
    BENCH_DETAIL.json, which always carries the full set) — the total
    and the expensive queries are what BASELINE comparisons read.
    """
    def drop_rank(name: str):
        pinned = _EMIT_KEEP_COST.get(name)
        # Un-pinned names (born after the pin epoch) sort AFTER every
        # pinned one — new entries stay visible to the driver.
        return (0, pinned, name) if pinned is not None else (1, 0.0, name)

    # The kept SET is a function of the measured-entry NAMES alone:
    # each entry is budgeted at its worst-case serialized width
    # ("name":999.999,) so a value one digit shorter or longer between
    # runs can never flip which entries fit (full determinism, not just
    # a deterministic drop order).
    # Worst-case envelope width (value/sf budgeted at 10 chars each, not
    # their current digit count) — so the kept set cannot flip when the
    # total gains or loses a digit between runs.
    overhead = (
        len(
            json.dumps(
                {
                    "metric": "headline_queries_total",
                    "value": 0,
                    "unit": "sec",
                    "queries": {},
                    "sf": 0,
                },
                separators=(",", ":"),
            )
        )
        + 20
    )
    keep_order = sorted(times, key=drop_rank, reverse=True)
    queries = {}
    budget = overhead
    for name in keep_order:
        width = len(name) + 3 + 7 + 1  # "name":999.999,
        if budget + width > limit:
            continue  # a shorter-named entry later may still fit
        budget += width
        # Rounded HERE so the 7-char value budget above is guaranteed
        # (main() already rounds; this makes emit_line self-contained).
        queries[name] = round(times[name], 3)
    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    main()
