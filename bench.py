"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric", "value", "unit", "queries", "sf",
"n_queries", "detail_file"}.

Output contract (round-8 fix, VERDICT r7 item 1): the driver captures
only a ~2,000-char tail of stdout, and at 53 queries the full per-query
walls + MAD dict grew to 3.3 KB, which the driver could not parse
(BENCH_r07 `parsed: null`). So the printed line now carries only the
headline metric plus the top-10 per-query walls (kept under ~1,200
chars at any plausible registry size), and the FULL per-query detail —
every wall, every MAD, any errors — goes to a sidecar JSON file
(default BENCH_DETAIL.json next to this script; BENCH_DETAIL_WRITE.json
in write mode; override with $SPARK_GRAFT_BENCH_DETAIL).

Per query: one warm-up execution (JIT/codegen/cache warm), then the
median of 3 timed runs. The headline metric is the sum of per-query
medians; the sidecar's "spread" dict carries each query's median
absolute deviation (MAD) across the timed runs, so a reader can tell
machine noise from a real regression mechanically (|delta| >> MAD =
real).

Two execution modes (same queries, same JSON contract):
  default            each run .collect()s — measures compute + the
                     executor->driver result path (the driver's
                     round-over-round series uses this mode);
  SPARK_GRAFT_BENCH_WRITE=1
                     each run writes the result to parquet in a temp
                     dir instead — measures compute + the distributed
                     WRITE path (file commit, no driver funnel), which
                     is what a 100 TB pipeline actually pays. Output
                     carries "mode": "write" so the two series are
                     never conflated.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "parity-pipeline",
    "q1-pricing-summary",
    "q3-shipping-priority",
    "q5-local-supplier-volume",
    "q6-forecast-revenue",
    "q9-product-profit",
    "q13-order-distribution",
    "q18-large-orders",
    "q21-waiting-supplier",
    "dedup-exact",
    "dedup-minhash-lsh",
    "dedup-semantic",
    "dedup-keep-best",
    "ann-topk-cosine",
    "curation-chunk-dedup",
    "curation-pack",
    "text-quality",
    "text-stats",
    "events-sessionize",
    "op-topk-per-group",
    "multimodal-decode",
    # round 6 additions: the transactional-table MERGE and the
    # bigram-LM scorer — new capabilities whose perf should be
    # tracked round-over-round (baselines start this round)
    "op-snapshot-merge",
    "text-bigram-ppl",
    # round 7 promotions (VERDICT r6 item 7): the rest of the round-6
    # capability tier gets round-over-round tracking, plus this
    # round's merge-on-read path
    "op-snapshot-cdf",
    "op-snapshot-incr-agg",
    "ann-index-table",
    "op-graph-pagerank",
    "curation-shards",
    "op-snapshot-merge-mor",
    # round 7 late additions: the two new metadata-pruned read paths
    # (Z-order box prune; bloom-indexed point read) — tracked from
    # this round so regressions in the prune planners show up as
    # wall-time, not just as test failures
    "op-snapshot-prune-box",
    "op-snapshot-bloom-read",
    # round 7 final additions: the Python DataSource surface — batch
    # read with catalyst pushdown file-pruning, and the two-phase
    # format write path — tracked from this round
    "op-snapshot-datasource",
    "op-snapshot-format-write",
    "op-snapshot-change-feed",  # CDC capture path wall-time
    # this session's curation additions — line-frequency boilerplate
    # removal, DSIR importance scoring, and the KMV distinct sketch —
    # tracked from first appearance
    "curation-boilerplate",
    "curation-dsir",
    "text-vocab-kmv",
    "text-heavy-hitters-cms",
    "ann-topk-pq",
    "text-bpe-train",
    "ann-index-ivfpq",
    "text-vocab-hll",  # HLL registers next to KMV: same stream, m ints
    "text-quantiles-sketch",  # additive dyadic quantile sketch read-back
    "curation-split-leakage",  # component-colocated split (CC + bucket)
    "search-hybrid-rrf",  # BM25 + cosine arms fused by integer RRF
    "corpus-new-vocab",  # KMV set-difference growth monitor
    "text-contamination-bloom",  # broadcast-bit-table decontamination screen
    "events-rolling-distinct-hll",  # sliding-window register merge
    "multimodal-resize",  # Arrow thumbnail map stage
    "search-mmr-rerank",  # hybrid arms + greedy diversity rerank
    "text-kneser-ney-ppl",  # KN-smoothed LM scorer
    "text-kneser-ney3-ppl",  # trigram KN recursive chain
    "text-quantiles-weighted",  # token-weighted percentile read-back
    # round 8 additions: column-mapped read across a mid-history rename
    # and the CCNet-style perplexity gate corpus mix — tracked from
    # first appearance
    "op-snapshot-rename",
    "curation-ppl-gate",
    # round 10 additions: the heuristic quality pre-filter, the
    # weighted-round-robin training order, and contrastive-pair
    # mining — tracked from first appearance
    "text-gopher-rules",
    "curation-curriculum",
    "embedding-hard-pairs",
    "curation-decon-spans",
    "curation-cluster-balance",
    "text-oov-rate",
    # round 11 addition: two-batch incremental near-dup through the
    # band-bucketed signature store — tracked from first appearance
    "dedup-incremental-store",
    # round 12 addition: exact single-column clustering + stat-point-
    # pruned big-batch MoR merge — tracked from first appearance
    "op-snapshot-cluster-merge",
]

TIMED_RUNS = 3
# The FIRST query measured runs on a JVM-cold session: codegen
# compilation, shuffle machinery, and the parquet reader all
# initialize inside its first executions, and one warm-up does not
# reach steady state (measured r9: parity-pipeline runs
# ~7.5 -> 1.8 -> 1.4 -> 1.27 -> ... -> 1.16 s; the old 1-warm-up
# median-of-3 protocol recorded ~1.5 s for a query whose steady-state
# wall is 1.16 s — the whole "parity drift" flagged across r6-r8 was
# this protocol bias, not a plan change; see BASELINE.md addendum 45).
# Extra warm-ups for the first query only: later queries inherit a
# warm JVM, where one warm-up suffices (their MADs stay small).
FIRST_QUERY_WARMUPS = 3


def _await_idle_machine() -> dict:
    """Idle-machine precondition (VERDICT r10 'what's wrong' #2): three
    separate rounds (addenda 45/51/58b) spent a closing addendum
    re-adjudicating load-spiked walls because the bench ran minutes
    after a long test-suite pass. Instead of trusting the caller, the
    bench WAITS for the 1-minute loadavg to decay below a threshold
    (bounded — a stuck-busy machine still benches rather than blinding
    the round) and records what it saw, so a later reader can tell a
    loaded run mechanically instead of via a steady-state rerun.
    Override the threshold/budget with $SPARK_GRAFT_BENCH_MAX_LOAD /
    $SPARK_GRAFT_BENCH_IDLE_WAIT_SEC (0 disables the wait)."""
    try:
        ncpu = os.cpu_count() or 8
        # tight threshold on purpose: the first guarded run started at
        # loadavg 3.27 (under the old ncpu/8=4.0 gate) and the WHOLE
        # shared query set benched ~1.2x elevated — residual load
        # inflates uniformly, so the gate must demand near-idle
        thresh = float(
            os.environ.get(
                "SPARK_GRAFT_BENCH_MAX_LOAD", max(1.5, ncpu / 16)
            )
        )
        budget = float(
            os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "600")
        )
        waited = 0.0
        load = os.getloadavg()[0]
        while load > thresh and waited < budget:
            time.sleep(15)
            waited += 15
            load = os.getloadavg()[0]
        return {
            "loadavg_at_start": round(load, 2),
            "load_threshold": thresh,
            "load_waited_sec": round(waited, 1),
            "loaded": load > thresh,
        }
    except OSError:  # platform without getloadavg
        return {}


def _run_control(ref: str, sf_dir: str, cur_timings: dict) -> dict:
    """Two-tree drift control (VERDICT r11 item 7): bench the SAME
    protocol on a git worktree of `ref` in this session, right after
    the current tree, and report per-query ratio pairs — so
    cross-round comparisons are measured against a same-day control
    instead of argued from different-day machine states (the r10/r11
    adjudication found the machine alone drifts 1.17x day-to-day).
    The control runs in its own subprocess/JVM behind the same idle
    gate; any failure is recorded, never fatal to the main bench."""
    import shutil
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        sha = subprocess.run(
            ["git", "rev-parse", ref], cwd=here,
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        wt = tempfile.mkdtemp(prefix=f"bench_ctrl_{sha[:8]}_")
        shutil.rmtree(wt)  # worktree add wants a fresh path
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=here, check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, OSError) as exc:
        return {"ref": ref, "err": f"worktree setup failed: {exc}"}
    try:
        ctrl_detail = os.path.join(wt, "CTRL_DETAIL.json")
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_DETAIL=ctrl_detail,
            SPARK_GRAFT_SF_DIR=sf_dir,
        )
        env.pop("SPARK_GRAFT_BENCH_CONTROL", None)
        try:
            subprocess.run(
                [sys.executable, os.path.join(wt, "bench.py")],
                cwd=wt, env=env, check=True, capture_output=True,
                timeout=7200,
            )
            with open(ctrl_detail) as fh:
                ctrl = json.load(fh)
        except (subprocess.SubprocessError, OSError, ValueError) as exc:
            return {"ref": ref, "sha": sha,
                    "err": f"control bench failed: {exc}"[:500]}
        cq = ctrl.get("queries", {})
        ratios = {
            k: round(v / cq[k], 3)
            for k, v in cur_timings.items()
            if isinstance(v, (int, float))
            and isinstance(cq.get(k), (int, float)) and cq[k] > 0
        }
        shared = sorted(ratios)
        tot_cur = sum(cur_timings[k] for k in shared)
        tot_ctrl = sum(cq[k] for k in shared)
        return {
            "ref": ref,
            "sha": sha,
            "value": ctrl.get("value"),
            "loadavg_at_start": ctrl.get("loadavg_at_start"),
            "queries": {k: cq[k] for k in shared},
            "spread": {
                k: v for k, v in ctrl.get("spread", {}).items()
                if k in ratios
            },
            "ratios": ratios,
            "n_shared": len(shared),
            "shared_total_ratio": (
                round(tot_cur / tot_ctrl, 4) if tot_ctrl else None
            ),
        }
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=here, capture_output=True,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    load_info = _await_idle_machine()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    from data_engineering_pipeline_spark.queries import collect_registry

    write_mode = os.environ.get("SPARK_GRAFT_BENCH_WRITE", "") == "1"
    if write_mode:
        import shutil
        import tempfile

        out_root = tempfile.mkdtemp(prefix="bench_write_")

    def run_once(fn, name: str) -> None:
        df = fn(spark, sf_dir)
        if write_mode:
            df.write.mode("overwrite").parquet(
                os.path.join(out_root, name)
            )
        else:
            df.collect()

    queries, _ = collect_registry()
    timings: dict[str, object] = {}
    spread: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        # Failure-isolated: one broken query records an error entry and the
        # rest of the bench still produces numbers (a crashed bench is a
        # blind round).
        try:
            n_warm = FIRST_QUERY_WARMUPS if not timings else 1
            for _ in range(n_warm):
                run_once(fn, name)  # warm-up
            runs = []
            for _ in range(TIMED_RUNS):
                t0 = time.perf_counter()
                run_once(fn, name)
                runs.append(time.perf_counter() - t0)
            med = statistics.median(runs)
            timings[name] = round(med, 4)
            spread[name] = round(
                statistics.median(abs(r - med) for r in runs), 4
            )
        except Exception as exc:  # noqa: BLE001 - any query failure is data
            msg = f"{type(exc).__name__}: {exc}"
            timings[name] = {"err": msg[:500]}
            errors[name] = msg[:500]

    total = round(
        sum(v for v in timings.values() if isinstance(v, (int, float))), 4
    )
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sf": sf,
        **load_info,
    }
    if write_mode:
        detail["mode"] = "write"
        shutil.rmtree(out_root, ignore_errors=True)
    if errors:
        detail["errors"] = errors

    # optional same-session control tree: --control <ref> (or
    # $SPARK_GRAFT_BENCH_CONTROL). Stops our JVM first so the control
    # subprocess benches the same resources.
    ctrl_ref = os.environ.get("SPARK_GRAFT_BENCH_CONTROL") or None
    if "--control" in sys.argv:
        i = sys.argv.index("--control") + 1
        # a missing ref must not discard the finished bench run —
        # record the misuse in the sidecar instead of raising
        ctrl_ref = sys.argv[i] if i < len(sys.argv) else None
        if ctrl_ref is None:
            detail["control"] = {"err": "--control given without a ref"}
    if ctrl_ref:
        spark.stop()
        detail["control"] = _run_control(ctrl_ref, sf_dir, timings)

    here = os.path.dirname(os.path.abspath(__file__))
    default_name = "BENCH_DETAIL_WRITE.json" if write_mode else "BENCH_DETAIL.json"
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", os.path.join(here, default_name)
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")

    # Compact printed line: headline metric + the top-10 most expensive
    # walls only. The driver parses a ~2,000-char stdout tail; this line
    # stays well under that at any registry size.
    numeric = {
        k: v for k, v in timings.items() if isinstance(v, (int, float))
    }
    top10 = dict(
        sorted(numeric.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": top10,
        "sf": sf,
        "n_queries": len(numeric),
        "detail_file": os.path.basename(detail_path),
    }
    if write_mode:
        out["mode"] = "write"
    if errors:
        out["n_errors"] = len(errors)
    if ctrl_ref:
        c = detail["control"]
        out["control"] = {
            "ref": ctrl_ref,
            **(
                {"err": c["err"][:120]} if "err" in c else
                {"value": c["value"],
                 "shared_total_ratio": c["shared_total_ratio"],
                 "n_shared": c["n_shared"]}
            ),
        }
    if load_info.get("loaded"):
        # the idle wait timed out on a busy machine: flag the run so
        # readers discount elevated walls without a steady-state rerun
        out["loaded"] = True
        out["loadavg_at_start"] = load_info["loadavg_at_start"]
    line = json.dumps(out)
    assert len(line) < 1500, f"bench line {len(line)} chars exceeds contract"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
