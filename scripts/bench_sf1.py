#!/usr/bin/env python3
"""Regenerate BENCH_sf1.json — the heavy-pipeline record at the 10×
tier — in one command, so the at-scale evidence can't drift behind the
code again (rounds 14/15 both shipped with a stale file).

Runs graft.Bench twice over the SAME heavy query set — once against
testdata-sf1 (synthesize first: scripts/gen_sf1.py) and once against
/root/testdata/sf0.1 for a same-day, same-box reference — then writes
BENCH_sf1.json with per-query medians and sf1/sf0.1 ratios. Ratios are
omitted (null) when the sf0.1 reference is under 0.5s: job-overhead
noise dominates there and the ratio is not a scaling signal.

Usage: python3 scripts/bench_sf1.py [out.json]   (default BENCH_sf1.json)
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The heavy set: every pipeline that exercises an iterative loop, a
# candidate-generation join, or a corpus-wide model fit — the shapes
# whose scaling behavior sf0.01 correctness cannot witness.
HEAVY = [
    "q_ann_eval", "q_ann_ivf", "q_ann_ivfpq", "q_ann_pq", "q_annpq_eval",
    "q_basket_pairs", "q_bfs_hops", "q_bloom_semi", "q_boost",
    "q_boost_eval", "q_boost_missing", "q_boost_predict_missing",
    "q_boost_proba", "q_boost_stages",
    "q_bpe_encode",
    "q_bpe_train", "q_cluster_terms", "q_cms_topk", "q_cooccur",
    "q_corpus_drift",
    "q_crossval", "q_crossval_missing", "q_curate_full", "q_curate_stats",
    "q_dbscan",
    "q_dbscan_lsh", "q_dedup_apply",
    "q_dedup_eval", "q_embed_pca", "q_event_transitions",
    "q_feature_importance", "q_fit_deep", "q_fit_missing", "q_fit_pruned",
    "q_fit_tree", "q_fit_windowed", "q_forest", "q_forest_importance",
    "q_forest_missing", "q_forest_mtry",
    "q_forest_oob", "q_forest_predict_missing", "q_forest_proba",
    "q_hits", "q_hll_groups", "q_hll_union", "q_kmeans",
    "q_kmv_overlap", "q_knn_brute", "q_label_prop", "q_link_pred",
    "q_minhash_lsh", "q_mmr", "q_model_roundtrip", "q_pagerank",
    "q_predict", "q_predict_proba", "q_quantile_bin", "q_semdedup",
    "q_substring_excise", "q_target_encode", "q_triangles",
]


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_ONLY=",".join(HEAVY))
    proc = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                          cwd=REPO, env=env, capture_output=True, text=True)
    line = next((l for l in proc.stdout.splitlines() if '{"metric"' in l),
                None)
    if proc.returncode != 0 or line is None:
        sys.exit(f"bench run on {sf_dir} failed "
                 f"(exit {proc.returncode}, metric line "
                 f"{'missing' if line is None else 'present'});\n"
                 f"--- stdout tail ---\n{proc.stdout[-2000:]}\n"
                 f"--- stderr tail ---\n{proc.stderr[-2000:]}")
    return json.loads(re.sub(r"^\[info\] ", "", line.strip()))


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_sf1.json")
    sf1_dir = os.path.join(REPO, "testdata-sf1")
    if not os.path.isdir(sf1_dir):
        sys.exit("testdata-sf1/ missing — run scripts/gen_sf1.py first")
    sf1 = run_bench(sf1_dir)
    print(f"sf1: {sf1['value']}s over {len(sf1['queries'])} queries")
    ref = run_bench("/root/testdata/sf0.1")
    print(f"sf0.1 reference: {ref['value']}s")
    ratios = {}
    for q in HEAVY:
        a, b = sf1["queries"].get(q), ref["queries"].get(q)
        # explicit None checks: a legitimate 0.0 timing is not "missing"
        ratios[q] = (round(a / b, 2)
                     if a is not None and b is not None and b >= 0.5
                     else None)
    report = {
        "metric": "heavy_pipelines_total",
        "value": round(sf1["value"], 3),
        "unit": "sec",
        "sf": "sf1 (10x sf0.1, synthesized by scripts/gen_sf1.py)",
        "cpus": 32,
        "reps": 3,
        "n_queries": len(HEAVY),
        "note": "median of 3 interleaved reps, clean cache between "
                "queries; sf0.1 reference measured the same run on the "
                "same box (scripts/bench_sf1.py)",
        "ratio_notes": {
            # sf1 is an exact 10x replication of sf0.1, so EVERY sf1
            # document has 9 byte-identical copies: the excision
            # workload (docs with duplicated windows) grows ~100x
            # (477/5000 affected at sf0.1 -> 50000/50000 at sf1), not
            # 10x. q_curate_full's ratio therefore measures workload
            # growth, not engine superlinearity — per affected doc the
            # cost FALLS (relational span-merge, round 17).
            "q_curate_full": "excision workload grows ~100x at this "
                             "tier (all docs duplicated by replication)",
            "q_curate_stats": "same pipeline as q_curate_full (same "
                              "~100x excision workload), aggregated"
        },
        "machine_state": {  # graft.Bench's self-diagnosis fields
            "sf1": {"loadavg": sf1.get("loadavg"),
                    "calibration_sec": sf1.get("calibration_sec")},
            "sf01_reference": {"loadavg": ref.get("loadavg"),
                               "calibration_sec": ref.get("calibration_sec")},
        },
        "queries": {q: round(v, 3) for q, v in sf1["queries"].items()},
        "sf01_reference": {q: round(v, 3) for q, v in ref["queries"].items()},
        "ratio_sf1_over_sf01": ratios,
    }
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
