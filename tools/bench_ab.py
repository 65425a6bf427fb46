#!/usr/bin/env python3
"""Interleaved same-context A/B benchmark — the standing protocol for
round-over-round performance claims (established rounds 9-10, where two
measurement windows read 0.86x and 1.08x on IDENTICAL code and the
adjudicator accepted only the interleaved run).

Why interleaved: machine load, page cache, and JVM/JIT warmth drift between
windows; sub-second planning-dominated ops swing ~2x on warmth alone. Running
A,B,A,B,... in one window with fresh JVMs per run cancels the window, and the
per-run `context` block in the bench JSON proves it.

Usage:
  python3 tools/bench_ab.py REF_A REF_B [--rounds 2] [--sf /root/testdata/sf0.1]
      [--only q_a,q_b] [--reps 5] [--cpus 32] [--out tools/bench_ab_result.json]

Each ref is built once in its own git worktree under target/ab/ (ignored),
then the two Bench mains alternate REF_A, REF_B per round, each a fresh JVM.
Output: per-query medians for each side, the B/A ratio, every run's context
block, and the run order — one JSON file, committable as evidence.

HEAD's uncommitted changes are NOT shipped: commit before comparing.
"""
import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd=REPO, env=None, check=True):
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    if check and r.returncode != 0:
        sys.exit(f"FAILED ({r.returncode}): {' '.join(cmd)}\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return r


def worktree_for(ref):
    sha = sh(["git", "rev-parse", ref]).stdout.strip()
    wt = os.path.join(REPO, "target", "ab", sha[:12])
    if not os.path.isdir(wt):
        sh(["git", "worktree", "add", "--detach", wt, sha])
    print(f"[ab] building {ref} ({sha[:12]}) ...", flush=True)
    sh(["sbt", "-batch", "compile"], cwd=wt)
    return sha, wt


def run_bench(wt, sf, only, reps, cpus):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_REPS=str(reps))
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    sh(["sbt", "-batch", "runMain graft.Bench"], cwd=wt, env=env)
    # Bench writes its self-contained line to tools/bench_latest.json in cwd —
    # the durable channel (stdout once truncated mid-JSON under log capture)
    with open(os.path.join(wt, "tools", "bench_latest.json")) as f:
        return json.loads(f.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--rounds", type=int, default=2,
                    help="A/B pairs to run (2 => A,B,A,B)")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="",
                    help="comma list for SPARK_GRAFT_BENCH_ONLY")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "tools", "bench_ab_result.json"))
    args = ap.parse_args()

    sha_a, wt_a = worktree_for(args.ref_a)
    sha_b, wt_b = worktree_for(args.ref_b)

    runs = {"A": [], "B": []}
    order = []
    for i in range(args.rounds):
        # ABBA: alternate pair order per round so a position effect inside a
        # pair (ambient load ramping, page-cache drift) cancels across rounds
        pair = (("A", wt_a), ("B", wt_b)) if i % 2 == 0 else (("B", wt_b), ("A", wt_a))
        for label, wt in pair:
            print(f"[ab] round {i + 1}/{args.rounds} side {label}", flush=True)
            r = run_bench(wt, args.sf, args.only, args.reps, args.cpus)
            runs[label].append(r)
            order.append(label)

    def medians(rs, key):
        out = {}
        for q in rs[0].get(key, {}):
            vals = [r[key][q] for r in rs if r[key].get(q, -1) >= 0]
            if vals:
                out[q] = round(statistics.median(vals), 4)
        return out

    result = {
        "protocol": "interleaved fresh-JVM A/B, per-query median across rounds",
        "ref_a": {"ref": args.ref_a, "sha": sha_a},
        "ref_b": {"ref": args.ref_b, "sha": sha_b},
        "order": order, "sf": args.sf, "reps": args.reps,
        "rounds": args.rounds, "only": args.only or None,
    }
    for key in ("queries", "table_ops"):
        a, b = medians(runs["A"], key), medians(runs["B"], key)
        shared = sorted(set(a) & set(b))
        result[key] = {
            "a": a, "b": b,
            "ratio_b_over_a": {q: round(b[q] / a[q], 3) for q in shared if a[q] > 0},
            "total_a_shared": round(sum(a[q] for q in shared), 4),
            "total_b_shared": round(sum(b[q] for q in shared), 4),
        }
        if result[key]["total_a_shared"] > 0:
            result[key]["total_ratio_b_over_a"] = round(
                result[key]["total_b_shared"] / result[key]["total_a_shared"], 4)
    result["contexts"] = {l: [r.get("context") for r in rs]
                          for l, rs in runs.items()}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[ab] wrote {args.out}")
    if "total_ratio_b_over_a" in result["queries"]:
        print(f"[ab] shared-query total B/A = {result['queries']['total_ratio_b_over_a']}")


if __name__ == "__main__":
    main()
