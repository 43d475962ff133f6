#!/usr/bin/env python3
"""Local replay of the driver's correctness gate at any scale tier.

Usage:
    python3 scripts/sweep.py <sfDir> <out.json> [dumpDir]

Steps:
 1. `sbt "runMain graft.Verify <sfDir> <dumpDir>"` — dumps every
    SparkEntry query result as parquet plus oracle_sql.json;
 2. for each oracled query, DuckDB runs the oracle SQL against the same
    parquet tables and the result is compared to the Spark parquet with
    the driver's semantics: columns sorted by name, rows sorted by all
    columns, dtype-strict pandas equals;
 3. writes a CORRECTNESS_r{N}-format report to <out.json>.

q_fit_tree's committed oracle is a VALUES pin of the sf0.01 golden rule
set (the driver's gate runs at sf0.01). At any other tier that pin does
not apply, so this script golden-compares q_fit_tree against the
committed rule set for the closest tier instead: sf0.1 and the
replicated sf1 tier share fit_sf01_rules.txt, because sf1 is 10 exact
copies of sf0.1 — identical class proportions at every split mean an
identical fitted tree (reported as hash_match with err "golden:<file>"
so the provenance is visible in the report).

Requires driver-side python deps (duckdb, pandas) — this is a harness
script, not library code.
"""
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
FIT_GOLDENS = {  # fit query -> tier-basename marker -> committed golden
    "q_fit_tree": {
        "sf0.1": "src/test/resources/golden/fit_sf01_rules.txt",
        "sf1": "src/test/resources/golden/fit_sf01_rules.txt",
    },
    "q_fit_pruned": {
        "sf0.1": "src/test/resources/golden/fit_pruned_sf01_rules.txt",
        "sf1": "src/test/resources/golden/fit_pruned_sf01_rules.txt",
    },
    # raising decisions are count-driven and decisive on this planted
    # geometry; sf1's exact 10x replication scales every count by 10
    # and leaves the raise in place, so the tiers share one golden
    "q_fit_raised": {
        "sf0.1": "src/test/resources/golden/fit_raised_sf01_rules.txt",
        "sf1": "src/test/resources/golden/fit_raised_sf01_rules.txt",
    },
    # the window draw hashes the row key and sf1 re-keys per replica,
    # so the windowed tree is tier-specific (unlike the plain fits)
    "q_fit_windowed": {
        "sf0.1": "src/test/resources/golden/fit_windowed_sf01_rules.txt",
        "sf1": "src/test/resources/golden/fit_windowed_sf1_rules.txt",
    },
    "q_rule_simplify": {
        "sf0.1": "src/test/resources/golden/rule_simplify_sf01_rules.txt",
        "sf1": "src/test/resources/golden/rule_simplify_sf01_rules.txt",
    },
}
CV_GOLDENS = {  # crossval query -> tier marker -> committed counts csv
    "q_crossval": {
        "sf0.1": "src/test/resources/golden/crossval_sf01.txt",
        "sf1": "src/test/resources/golden/crossval_sf1.txt",
    },
    "q_crossval_missing": {
        "sf0.1": "src/test/resources/golden/crossval_missing_sf01.txt",
        "sf1": "src/test/resources/golden/crossval_missing_sf1.txt",
    },
}
IMP_GOLDENS = {  # importance query -> tier marker -> committed micros csv
    "q_feature_importance": {
        "sf0.1": "src/test/resources/golden/importance_sf01.txt",
        "sf1": "src/test/resources/golden/importance_sf1.txt",
    },
}
PROBA_GOLDENS = {  # q_predict_proba: distinct (prediction, micros) + counts
    "q_predict_proba": {
        "sf0.1": "src/test/resources/golden/proba_sf01.txt",
        "sf1": "src/test/resources/golden/proba_sf1.txt",
    },
    # save -> load -> transformProba must be bit-identical to the live
    # model at every tier, so it shares q_predict_proba's goldens
    "q_model_roundtrip": {
        "sf0.1": "src/test/resources/golden/proba_sf01.txt",
        "sf1": "src/test/resources/golden/proba_sf1.txt",
    },
}
SIMPLIFY_PROBA_GOLDENS = {  # same shape, N/P classes (planted-XOR fixture)
    "q_simplify_proba": {
        "sf0.1": "src/test/resources/golden/simplify_proba_sf01.txt",
        "sf1": "src/test/resources/golden/simplify_proba_sf1.txt",
    },
}
FOREST_GOLDENS = {  # bagged forest -> tier marker -> committed rules
    # NOTE: unlike the single-tree fits, sf1 does NOT share sf0.1's
    # golden — gen_sf1.py re-keys l_orderkey per copy, so the
    # deterministic bootstrap draws (md5 of the row key) differ per
    # replica and the ensemble is tier-specific.
    "q_forest": {
        "sf0.1": "src/test/resources/golden/forest_sf01_rules.txt",
        "sf1": "src/test/resources/golden/forest_sf1_rules.txt",
    },
    "q_forest_missing": {
        "sf0.1": "src/test/resources/golden/forest_missing_sf01_rules.txt",
        "sf1": "src/test/resources/golden/forest_missing_sf1_rules.txt",
    },
    "q_forest_mtry": {
        "sf0.1": "src/test/resources/golden/forest_mtry_sf01_rules.txt",
        "sf1": "src/test/resources/golden/forest_mtry_sf1_rules.txt",
    },
}
PRED_COUNTS_GOLDENS = {  # fractional-serving prediction counts per tier
    "q_forest_predict_missing": {
        "sf0.1": "src/test/resources/golden/forest_pm_sf01.txt",
        "sf1": "src/test/resources/golden/forest_pm_sf1.txt",
    },
    "q_boost_predict_missing": {
        "sf0.1": "src/test/resources/golden/boost_pm_sf01.txt",
        "sf1": "src/test/resources/golden/boost_pm_sf1.txt",
    },
}
FOREST_OOB_GOLDENS = {  # OOB confusion counts per tier (same reason)
    "q_forest_oob": {
        "sf0.1": "src/test/resources/golden/forest_oob_sf01.txt",
        "sf1": "src/test/resources/golden/forest_oob_sf1.txt",
    },
}
FOREST_PROBA_GOLDENS = {  # ensemble-averaged micros per tier (same reason)
    "q_forest_proba": {
        "sf0.1": "src/test/resources/golden/forest_proba_sf01.txt",
        "sf1": "src/test/resources/golden/forest_proba_sf1.txt",
    },
    # save -> load -> transformProba must be bit-identical to the live
    # ensemble at every tier, so it shares q_forest_proba's goldens
    "q_forest_roundtrip": {
        "sf0.1": "src/test/resources/golden/forest_proba_sf01.txt",
        "sf1": "src/test/resources/golden/forest_proba_sf1.txt",
    },
}
FOREST_IMP_GOLDENS = {  # mean per-tree importance micros (same reason)
    "q_forest_importance": {
        "sf0.1": "src/test/resources/golden/forest_importance_sf01.txt",
        "sf1": "src/test/resources/golden/forest_importance_sf1.txt",
    },
}
BOOST_GOLDENS = {  # AdaBoost.M1 rounds per tier (weighted fits are
    # data-dependent, so every tier pins its own ensemble)
    "q_boost": {
        "sf0.1": "src/test/resources/golden/boost_sf01_rules.txt",
        "sf1": "src/test/resources/golden/boost_sf1_rules.txt",
    },
    "q_boost_missing": {
        "sf0.1": "src/test/resources/golden/boost_missing_sf01_rules.txt",
        "sf1": "src/test/resources/golden/boost_missing_sf1_rules.txt",
    },
}
BOOST_EVAL_GOLDENS = {  # boosted-vote confusion counts per tier
    "q_boost_eval": {
        "sf0.1": "src/test/resources/golden/boost_eval_sf01.txt",
        "sf1": "src/test/resources/golden/boost_eval_sf1.txt",
    },
}
BOOST_PROBA_GOLDENS = {  # normalized α-mass shares per tier (the
    # weighted fits are data-dependent; same N/P share shape as
    # simplify_proba). q_boost_roundtrip must be bit-identical to the
    # live ensemble at every tier, so it shares q_boost_proba's files.
    "q_boost_proba": {
        "sf0.1": "src/test/resources/golden/boost_proba_sf01.txt",
        "sf1": "src/test/resources/golden/boost_proba_sf1.txt",
    },
    "q_boost_roundtrip": {
        "sf0.1": "src/test/resources/golden/boost_proba_sf01.txt",
        "sf1": "src/test/resources/golden/boost_proba_sf1.txt",
    },
}
BOOST_STAGES_GOLDENS = {  # staged error-curve confusions per tier
    "q_boost_stages": {
        "sf0.1": "src/test/resources/golden/boost_stages_sf01.txt",
        "sf1": "src/test/resources/golden/boost_stages_sf1.txt",
    },
}


def fit_golden_frame(path):
    """golden rules txt -> the (rule, label, depth) frame qFitTree emits
    (same parse as C45Queries.qFitTreeSql)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            cut = line.rfind(":")
            conds = line[:cut]
            depth = 0 if not conds else conds.count("&") + 1
            rows.append((line, line[cut + 1:], depth))
    df = pd.DataFrame(rows, columns=["rule", "label", "depth"])
    df["depth"] = df["depth"].astype("int32")
    return df


def cv_golden_frame(path):
    """golden counts txt (fold,n,c lines) -> the (fold, n_test,
    n_correct) frame qCrossVal emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                a, b, c = line.split(",")
                rows.append((int(a), int(b), int(c)))
    df = pd.DataFrame(rows, columns=["fold", "n_test", "n_correct"])
    df["fold"] = df["fold"].astype("int32")
    return df


def imp_golden_frame(path):
    """golden micros txt (attr,m lines) -> the (attr,
    importance_micros) frame qFeatureImportance emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                a, m = line.split(",")
                rows.append((a, int(m)))
    return pd.DataFrame(rows, columns=["attr", "importance_micros"])


def proba_golden_frame(path):
    """golden proba txt (prediction,p_f,p_o,n lines) -> the frame
    qPredictProba emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                p, pf, po, n = line.split(",")
                rows.append((p, int(pf), int(po), int(n)))
    return pd.DataFrame(rows, columns=["prediction", "p_f", "p_o", "n"])


def simplify_proba_golden_frame(path):
    """same shape as proba_golden_frame, N/P class columns (the frame
    qSimplifyProba emits)."""
    return proba_golden_frame(path).rename(
        columns={"p_f": "p_n", "p_o": "p_p"})


def forest_golden_frame(path):
    """golden forest txt (tree|rule|majority lines) -> the (tree, rule,
    label, depth, majority) frame qForest emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            t, rule, maj = line.split("|", 2)
            cut = rule.rfind(":")
            conds = rule[:cut]
            depth = 0 if not conds else conds.count("&") + 1
            rows.append((int(t), rule, rule[cut + 1:], depth, maj))
    df = pd.DataFrame(rows,
                      columns=["tree", "rule", "label", "depth", "majority"])
    df["tree"] = df["tree"].astype("int32")
    df["depth"] = df["depth"].astype("int32")
    return df


def forest_oob_golden_frame(path):
    """golden OOB counts txt (actual,pred,n lines) -> the (actual,
    oob_prediction, n) frame qForestOob emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                a, p, n = line.split(",")
                rows.append((a, p, int(n)))
    return pd.DataFrame(rows, columns=["actual", "oob_prediction", "n"])


def boost_golden_frame(path):
    """golden boost txt (round|rule|alpha|error|majority lines) -> the
    (round, rule, label, depth, alpha_micros, error_micros, majority)
    frame qBoost emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            t, rule, a, e, maj = line.split("|", 4)
            cut = rule.rfind(":")
            conds = rule[:cut]
            depth = 0 if not conds else conds.count("&") + 1
            rows.append((int(t), rule, rule[cut + 1:], depth,
                         int(a), int(e), maj))
    df = pd.DataFrame(rows, columns=["round", "rule", "label", "depth",
                                     "alpha_micros", "error_micros",
                                     "majority"])
    df["round"] = df["round"].astype("int32")
    df["depth"] = df["depth"].astype("int32")
    return df


def boost_eval_golden_frame(path):
    """golden boosted-confusion txt (actual,pred,n lines) -> the
    (actual, prediction, n) frame qBoostEval emits."""
    return forest_oob_golden_frame(path).rename(
        columns={"oob_prediction": "prediction"})


def pred_counts_golden_frame(path):
    """golden counts txt (prediction,n lines) -> the (prediction, n)
    frame qForestPredictMissing emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                p, n = line.split(",")
                rows.append((p, int(n)))
    return pd.DataFrame(rows, columns=["prediction", "n"])


def boost_stages_golden_frame(path):
    """golden staged-confusion txt (stage,actual,pred,n lines) -> the
    (stage, actual, prediction, n) frame qBoostStages emits."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                k, a, p, n = line.split(",")
                rows.append((int(k), a, p, int(n)))
    df = pd.DataFrame(rows, columns=["stage", "actual", "prediction", "n"])
    df["stage"] = df["stage"].astype("int32")
    return df


def canon(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols).reset_index(drop=True)


def main():
    sf_dir = os.path.abspath(sys.argv[1])
    out_json = sys.argv[2]
    dump = os.path.abspath(sys.argv[3]) if len(sys.argv) > 3 else "/tmp/graft_sweep"
    tier = os.path.basename(sf_dir.rstrip("/"))

    # the dump dir is this run's scratch: clear stale query dirs from a
    # previous (possibly SPARK_GRAFT_ONLY-filtered) run, or the report
    # silently mixes tiers/runs
    if os.path.isdir(dump):
        import shutil
        shutil.rmtree(dump)

    subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {dump}'],
        cwd=REPO, check=True)

    with open(os.path.join(dump, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = sorted(d for d in os.listdir(dump)
                   if os.path.isdir(os.path.join(dump, d)))
    report, bad = {}, 0
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{dump}/{name}/*.parquet')").fetchdf()
        err = None
        golden_kind = next((
            (tiers, builder)
            for tiers, builder in ((FIT_GOLDENS.get(name), fit_golden_frame),
                                   (CV_GOLDENS.get(name), cv_golden_frame),
                                   (IMP_GOLDENS.get(name), imp_golden_frame),
                                   (PROBA_GOLDENS.get(name), proba_golden_frame),
                                   (SIMPLIFY_PROBA_GOLDENS.get(name),
                                    simplify_proba_golden_frame),
                                   (FOREST_GOLDENS.get(name),
                                    forest_golden_frame),
                                   (FOREST_OOB_GOLDENS.get(name),
                                    forest_oob_golden_frame),
                                   (FOREST_PROBA_GOLDENS.get(name),
                                    proba_golden_frame),
                                   (FOREST_IMP_GOLDENS.get(name),
                                    imp_golden_frame),
                                   (BOOST_GOLDENS.get(name),
                                    boost_golden_frame),
                                   (BOOST_EVAL_GOLDENS.get(name),
                                    boost_eval_golden_frame),
                                   (BOOST_PROBA_GOLDENS.get(name),
                                    simplify_proba_golden_frame),
                                   (BOOST_STAGES_GOLDENS.get(name),
                                    boost_stages_golden_frame),
                                   (PRED_COUNTS_GOLDENS.get(name),
                                    pred_counts_golden_frame))
            if tiers), None)
        if golden_kind and tier != "sf0.01":
            tiers, builder = golden_kind
            marker = next((m for m in tiers if m in tier), None)
            if marker is None:
                report[name] = {"rows_match": None, "schema_match": None,
                                "hash_match": None, "spark_rows": len(got),
                                "oracle_rows": None, "err": "no_oracle"}
                continue
            golden = os.path.join(REPO, tiers[marker])
            exp, err = builder(golden), f"golden:{tiers[marker]}"
        elif name in oracles:
            exp = con.execute(oracles[name]).fetchdf()
        else:
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(got),
                            "oracle_rows": None, "err": "no_oracle"}
            continue
        ok_schema = sorted(got.columns) == sorted(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                ok_vals = canon(got).equals(canon(exp))
            except Exception as e:  # unsortable column types etc.
                err = f"compare: {e}"
        report[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                        "hash_match": ok_vals, "spark_rows": len(got),
                        "oracle_rows": len(exp), "err": err}
        if not ok_vals:
            bad += 1
            print(f"FAIL {name}: schema={ok_schema} rows={ok_rows} "
                  f"({len(got)} vs {len(exp)})")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    ok = sum(1 for v in report.values() if v["hash_match"])
    print(f"wrote {out_json}: {ok} hash-match, "
          f"{sum(1 for v in report.values() if v['err'] == 'no_oracle')} "
          f"no_oracle, {len(report)} total")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
