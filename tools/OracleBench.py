#!/usr/bin/env python3
"""The 2x-gate denominator harness: two-pass DuckDB timing of every
oracle_sql.json entry, emitting a steady JSON shaped like graft.Bench's —
so the Spark/DuckDB ratio is ONE in-repo command instead of a per-judge
re-derivation (three judges measured three denominators — 71.1 / 58.2 /
62.9 s — for substantially the same oracles before this existed).

Usage:
  # denominator only (oracle_sql.json from a prior graft.Verify run):
  python3 tools/OracleBench.py --oracle /tmp/verify_out/oracle_sql.json \
      --sf-dir /root/testdata/sf0.1

  # the one-command ratio: run graft.Bench (numerator) in the same
  # terminal session, then the DuckDB denominator, then print both +
  # ratio:
  python3 tools/OracleBench.py --oracle ... --sf-dir ... --run-spark

Protocol (BENCHNOTES.md): per query, pass 1 = first (plan + first
execution), pass 2 = steady (the cross-round comparison basis). Both
sides must run on a QUIET machine in the same session; the summary's
`ratio_steady_all_in` is the gate number, `ratio_steady_adjusted`
excludes the queries whose Spark side performs lake writes / streaming-
state folds against a pure-SELECT oracle (the comparison-class rows, not
a like-for-like denominator).
"""
import argparse, json, os, subprocess, sys, time

import duckdb


def read_loadavg():
    """(1m, 5m, 15m) host load — the window evidence that retired the
    cross-round comparability ruling: five builder runs on constant code
    read 1.70x..2.10x purely with host load 3.7-4.9 vs quiet."""
    with open("/proc/loadavg") as f:
        parts = f.read().split()
    return [float(parts[0]), float(parts[1]), float(parts[2])]


def calibrate():
    """Wall-clock of a FIXED single-thread pure-CPU DuckDB query
    (hash-fold over a constant range, no table inputs): a machine-speed
    probe whose slowdown vs its quiet-window baseline (~0.1-0.2 s)
    measures contention DURING the run, where loadavg only brackets it."""
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    t0 = time.perf_counter()
    con.execute("SELECT max(hash(range)) FROM range(20000000)").fetchall()
    return time.perf_counter() - t0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Spark side does real side effects (lake round-trips, MERGE/compaction,
# streaming-state folds, bucketed-table writes) that the pure-SELECT
# oracle never pays — comparison-class rows, excluded from the adjusted
# ratio only. Keep in sync with the query registry; unknown names here
# fail loudly below.
SIDE_EFFECT_QUERIES = [
    "q25_dedup_first", "q41_alerts_stream", "q45_lake_roundtrip",
    "q54_lake_pruned", "q77_merge_upsert", "q78_compression_inference",
    "q81_alerts_retro_lake", "q82_routed_ingest", "q89_sideline_gate",
    "q95_embed_pipeline", "q96_stream_dedup_fold", "q109_index_incremental",
    "q121_hll_fold", "q123_sliding_distinct", "q124_kll_fold",
    "q131_bucketed_join", "q133_zorder_pruned", "q143_ivf_lake_fold",
    "q153_lsh_index_fold", "q156_ivfpq_search",
    "q171_paragraph_dedup_fold", "q176_c4_span_dedup_fold",
    "q185_release_pipeline", "q186_unimax_fold", "q191_pack_fold",
    "q193_unimax_take_fold", "q199_web_pipeline",
    "q201_curation_release_diff", "q202_web_pipeline_fold",
]


def time_duckdb(oracle: dict, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    first, steady, errors = {}, {}, []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            first[name] = time.perf_counter() - t0
            t1 = time.perf_counter()
            con.execute(sql).fetchall()
            steady[name] = time.perf_counter() - t1
        except Exception as e:  # a broken oracle is a gate failure, not a skip
            errors.append(f"{name} ({type(e).__name__})")
            print(f"[oraclebench] {name} failed: {e}", file=sys.stderr)
    return first, steady, errors


def run_spark_bench(sf_dir: str, cpus: str):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, capture_output=True, text=True, check=False)
    for line in out.stdout.splitlines():
        # sbt prefixes runMain stdout with "[info] "
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    print(out.stdout[-4000:], file=sys.stderr)
    raise SystemExit("graft.Bench produced no JSON line")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", required=True,
                    help="oracle_sql.json from a graft.Verify run")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--run-spark", action="store_true",
                    help="also run graft.Bench (numerator) in this session")
    ap.add_argument("--spark-json", default=None,
                    help="existing graft.Bench JSON (skip re-running Spark)")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--out", default=None, help="write summary JSON here too")
    ap.add_argument("--expect-n", type=int, default=None,
                    help="fail unless the oracle file has exactly N queries")
    ap.add_argument("--load-flag", type=float, default=1.5,
                    help="flag the run contended if pre-run 1-min loadavg "
                         "exceeds this (quiet-box gate discipline)")
    ap.add_argument("--allow-subset", action="store_true",
                    help="permit a GRAFT_VERIFY_ONLY subset manifest (dev only)")
    ap.add_argument("--staged-dir", default=None,
                    help="graft.tools.StageBench output dir: re-time the "
                         "memoized-artifact queries with oracles that READ "
                         "the staged artifacts (symmetric serve-path "
                         "denominator); each staged oracle is verified "
                         "row-identical to the re-deriving one first")
    args = ap.parse_args()

    oracle = json.load(open(args.oracle))
    unknown = [q for q in SIDE_EFFECT_QUERIES if q not in oracle]
    if unknown:
        print(f"[oraclebench] WARNING: side-effect list names absent from "
              f"oracle set: {unknown}", file=sys.stderr)

    # Staleness gate: graft.Verify writes query_manifest.json (the FULL
    # SparkEntry registry) next to oracle_sql.json. A stale verify dir
    # once silently shrank a judge's gate run by 3 queries — so any
    # oracle file that doesn't cover every registered oracle is a HARD
    # error naming the missing queries, not a quiet smaller sweep.
    # `subset: true` manifests (dev GRAFT_VERIFY_ONLY dumps) are refused
    # outright unless --allow-subset is passed.
    manifest_path = os.path.join(os.path.dirname(os.path.abspath(args.oracle)),
                                 "query_manifest.json")
    if os.path.exists(manifest_path):
        manifest = json.load(open(manifest_path))
        if manifest.get("subset"):
            if not args.allow_subset:
                raise SystemExit(
                    "[oraclebench] FATAL: manifest marks this verify dir as "
                    "a GRAFT_VERIFY_ONLY subset dump — not gate-grade. "
                    "Re-run graft.Verify without GRAFT_VERIFY_ONLY (or pass "
                    "--allow-subset for a dev sweep).")
            print("[oraclebench] subset manifest accepted (--allow-subset); "
                  "NOT a gate-grade sweep.", file=sys.stderr)
        else:
            registered = set(manifest.get("oracles", []))
            missing = sorted(registered - set(oracle))
            extra = sorted(set(oracle) - registered)
            if missing or extra:
                raise SystemExit(
                    f"[oraclebench] FATAL: oracle file is stale vs the "
                    f"registry manifest ({manifest_path}): "
                    f"missing={missing or '[]'} extra={extra or '[]'}. "
                    f"Re-run graft.Verify and point --oracle at its output.")
    else:
        print(f"[oraclebench] WARNING: no query_manifest.json beside the "
              f"oracle file — cannot prove the oracle set is current "
              f"(pre-r16 verify dir?). Re-run graft.Verify for a "
              f"gate-grade sweep.", file=sys.stderr)
    if args.expect_n and len(oracle) != args.expect_n:
        raise SystemExit(
            f"[oraclebench] FATAL: --expect-n {args.expect_n} but oracle "
            f"file has {len(oracle)} queries.")

    # window self-report (the r19 carried item, retired mechanically):
    # loadavg brackets + a single-thread calibration query around each
    # pass, so every gate JSON carries its own contention evidence
    # instead of relying on a separately-captured `uptime`.
    window = {"load_start": read_loadavg(), "calib_sec_start": calibrate()}

    spark = None
    if args.run_spark:
        spark = run_spark_bench(args.sf_dir, args.cpus)
        window["load_after_spark"] = read_loadavg()
        window["calib_sec_after_spark"] = calibrate()
    elif args.spark_json:
        spark = json.load(open(args.spark_json))

    first, steady, errors = time_duckdb(oracle, args.sf_dir)
    window["load_end"] = read_loadavg()
    window["calib_sec_end"] = calibrate()

    staged = None
    if args.staged_dir:
        staged_sql = json.load(
            open(os.path.join(args.staged_dir, "oracle_staged.json")))
        staged_sql = {q: sql.replace("{STAGED}", args.staged_dir)
                      for q, sql in staged_sql.items()}
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{args.sf_dir}/{t}.parquet')")
        staged = {}
        for q, sql in sorted(staged_sql.items()):
            if q not in oracle:
                raise SystemExit(f"[oraclebench] FATAL: staged oracle {q} "
                                 f"names no registered oracle")
            # a staged oracle that drifts from the re-deriving one would
            # time the wrong computation — verify rows bit-identical first
            want = con.execute(oracle[q]).fetchall()
            got = con.execute(sql).fetchall()
            if want != got:
                raise SystemExit(
                    f"[oraclebench] FATAL: staged oracle {q} returns "
                    f"different rows than the re-deriving oracle "
                    f"({len(got)} vs {len(want)}) — stale artifacts or "
                    f"drifted SQL. Re-run graft.tools.StageBench.")
            con.execute(sql).fetchall()  # plan+first
            t1 = time.perf_counter()
            con.execute(sql).fetchall()
            staged[q] = time.perf_counter() - t1

    # auto-flag: pre-run load should be ~0 on a quiet box (the sweep
    # itself raises later brackets — that's expected and not flagged);
    # the calibration probe catches contention DURING the run (a quiet
    # single-thread hash-fold reads ~0.1-0.2 s; 2x drift between probes
    # of one run means another workload stole the core).
    calibs = [v for k, v in window.items() if k.startswith("calib_sec")]
    # 1.8x drift threshold: a round-20 run with calib 0.100 -> 0.050
    # (1.99x, genuinely degraded — spark steady +43% vs the quiet run on
    # identical code) slipped under the original 2.0x
    window["contended"] = bool(
        window["load_start"][0] > args.load_flag
        or (min(calibs) > 0 and max(calibs) / min(calibs) > 1.8))

    summary = {
        "metric": "oracle_total",
        "value": sum(first.values()),
        "unit": "sec",
        "queries": first,
        "total_steady": sum(steady.values()),
        "queries_steady": steady,
        "errors": errors,
        "sf": args.sf_dir,
        "n_queries": len(steady),
        "window": window,
    }
    if window["contended"]:
        print(f"[oraclebench] WARNING: window flagged contended "
              f"(load_start={window['load_start']}, calib spread "
              f"{min(calibs):.3f}..{max(calibs):.3f} s) — not a "
              f"cross-round-comparable reading.", file=sys.stderr)
    if spark is not None:
        ss = spark.get("queries_steady", {})
        common = sorted(set(ss) & set(steady))
        adj = [q for q in common if q not in SIDE_EFFECT_QUERIES]
        spark_all = sum(ss[q] for q in common)
        duck_all = sum(steady[q] for q in common)
        spark_adj = sum(ss[q] for q in adj)
        duck_adj = sum(steady[q] for q in adj)
        summary["spark_total_steady"] = spark_all
        summary["duck_total_steady"] = duck_all
        summary["spark_queries_steady"] = {q: ss[q] for q in common}
        summary["ratio_steady_all_in"] = spark_all / duck_all if duck_all else None
        summary["ratio_steady_adjusted"] = spark_adj / duck_adj if duck_adj else None
        summary["n_common"] = len(common)
        summary["n_adjusted"] = len(adj)
        missing = sorted(set(steady) - set(ss))
        if missing:
            summary["spark_missing"] = missing
        if staged is not None:
            # symmetric ratios: the staged queries' duck denominator is
            # the serve-path (artifact-reading) timing, everything else
            # unchanged — both totals reported side by side
            duck_sym = {q: staged.get(q, steady[q]) for q in common}
            duck_all_sym = sum(duck_sym.values())
            duck_adj_sym = sum(duck_sym[q] for q in adj)
            summary["staged"] = {
                q: {"duck_steady_rederive": steady[q],
                    "duck_steady_staged": staged[q],
                    "spark_steady": ss.get(q)}
                for q in sorted(staged)}
            summary["ratio_steady_all_in_symmetric"] = (
                spark_all / duck_all_sym if duck_all_sym else None)
            summary["ratio_steady_adjusted_symmetric"] = (
                spark_adj / duck_adj_sym if duck_adj_sym else None)
    elif staged is not None:
        summary["staged"] = {
            q: {"duck_steady_rederive": steady[q],
                "duck_steady_staged": staged[q]} for q in sorted(staged)}
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
