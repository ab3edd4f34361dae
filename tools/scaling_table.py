#!/usr/bin/env python3
"""Regenerate the scaling table in SCALING.md.

Reads target/bench_sf01_r5.json and target/bench_sf1.json (both written
by graft.Bench via the dual-SF run) and, when present,
target/bench_sf10.json (the round-6 100x heavy-subset run). Computes
per-query time ratios for the heavy/interesting subset plus any query
whose ratio is anomalous, and replaces the section between the
`<!-- SCALING_TABLE -->` marker and the next `##` heading in SCALING.md.

The sf10 run is a SUBSET (SPARK_GRAFT_BENCH_ONLY): full-suite sf10 would
spend most of its wall clock on the labeled-quadratic all-pairs baseline,
which scales as its contract says and proves nothing new. Queries absent
from the sf10 artifact show `-` in that column.
"""
import json
import os
import sys

HEAVY = [
    "q_dedup_minhash_lsh", "q_dedup_minhash_fast", "q_dedup_incremental",
    "q_dedup_collapse", "q_dedup_exact_groups", "q_dedup_ngram_jaccard",
    "q_dedup_simhash", "q_dedup_semantic", "q_dedup_embedding",
    "q_dedup_embedding_lsh", "q_dedup_embedding_lsh_scale",
    "q_graph_centrality", "q_identity_fixpoint", "q_identity_resolve",
    "q_identity_evolution", "q_identity_evolution_registry",
    "q_identity_rerun",
    "q_pipeline_validate", "q_pipeline_report", "q_text_tfidf",
    "q_text_bpe_learn", "q_text_winnow", "q_curation_pipeline",
    "q_vec_topk_cosine", "q_vec_ann_lsh", "q_vec_ann_ivf", "q_vec_pq_search",
    "q_sample_leakage_free", "q_agg_pricing", "q_h3_shipping_priority",
    "q_stream_windowed", "q_stream_sessions", "q_asof_purchase",
    "q_range_join", "q_merge_partitioned", "q_multimodal_audio",
]
QUADRATIC = {"q_dedup_embedding": "all-pairs by contract (expect ~100x)"}


def main():
    a = json.load(open("target/bench_sf01_r5.json"))["queries"]
    b = json.load(open("target/bench_sf1.json"))["queries"]
    c = {}
    if os.path.exists("target/bench_sf10.json"):
        c = json.load(open("target/bench_sf10.json"))["queries"]
    rows = []
    for q in HEAVY:
        if q not in a or q not in b or a[q] <= 0 or b[q] <= 0:
            continue
        rows.append((q, a[q], b[q], b[q] / a[q], c.get(q)))
    # anomalies outside the curated list: ratio > 12 and sf1 time > 2s
    for q in sorted(set(a) & set(b)):
        if q in HEAVY or a[q] <= 0 or b[q] <= 0:
            continue
        if b[q] / a[q] > 12 and b[q] > 2:
            rows.append((q, a[q], b[q], b[q] / a[q], c.get(q)))
    rows.sort(key=lambda r: -r[2])

    lines = [
        "",
        "| query | sf0.1 (s) | sf1 (s) | 10x ratio | sf10 (s) | 100x ratio | note |",
        "|---|---|---|---|---|---|---|",
    ]
    for q, ta, tb, r, tc in rows:
        note = QUADRATIC.get(q, "")
        if not note and r > 12:
            note = "**superlinear — investigate**"
        if tc is not None and tc > 0 and not note and tc / ta > 130:
            note = "**superlinear at 100x — investigate**"
        c10 = f"{tc:.2f}" if tc is not None and tc > 0 else "-"
        r100 = f"{tc / ta:.1f}x" if tc is not None and tc > 0 else "-"
        lines.append(
            f"| {q} | {ta:.2f} | {tb:.2f} | {r:.1f}x | {c10} | {r100} | {note} |")
    ta_tot = json.load(open("target/bench_sf01_r5.json"))["value"]
    tb_tot = json.load(open("target/bench_sf1.json"))["value"]
    lines.append("")
    lines.append(
        f"Totals: **{ta_tot:.1f} s at sf0.1 → {tb_tot:.1f} s at sf1** over the "
        f"full {len(b)}-query suite ({tb_tot / ta_tot:.1f}x for 10x rows).")
    if c:
        c_tot = json.load(open("target/bench_sf10.json"))["value"]
        subset01 = sum(a[q] for q in c if q in a and a[q] > 0)
        lines.append("")
        lines.append(
            f"sf10 (100x rows): **{c_tot:.1f} s over the {len(c)}-query heavy "
            f"subset** vs {subset01:.1f} s for the same subset at sf0.1 "
            f"({c_tot / subset01:.1f}x for 100x rows; labeled-quadratic "
            f"baseline excluded, its LSH scale path included).")
    lines.append("")

    md = open("SCALING.md").read()
    marker = "<!-- SCALING_TABLE -->"
    start = md.index(marker) + len(marker)
    end = md.index("\n## ", start)
    open("SCALING.md", "w").write(md[:start] + "\n" + "\n".join(lines) + md[end:])
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
