"""One-shot measurement sweep after the round-2 gather/sort/remat work.

Runs, strictly one TPU process at a time (each stage in its own child,
CLAUDE.md rules 1/7):
  1. scripts/bench_gather.py          gather/sort cost model probes
  2. scripts/bench_emfirst_parts.py   emitter-first decomposition
  3. scripts/bench_e2e_stages.py cam / nee / full   stage anatomy
  4. bench.py                         headline forward + backward

Writes everything to stdout incrementally; run with
`python -u scripts/bench_r2_sweep.py > /tmp/sweep.log 2>&1`.
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag, args, timeout=5400):
    print(f"=== {tag}: {' '.join(args)}", flush=True)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-u"] + args, cwd=ROOT,
                       capture_output=True, text=True, timeout=timeout)
    out = "\n".join(l for l in r.stdout.splitlines()
                    if "WARNING" not in l and l.strip())
    print(out, flush=True)
    if r.returncode != 0:
        print(f"--- {tag} FAILED rc={r.returncode}\n{r.stderr[-500:]}",
              flush=True)
    print(f"--- {tag} done in {time.time()-t0:.0f}s", flush=True)


def main():
    # Decision-relevant stages first (flag flips depend on them), anatomy
    # probes last — if the round ends mid-sweep we still get the A/Bs.
    # backward gather-transpose strategy A/B (CLAUDE.md roadmap 2):
    # sorted/cumsum replace the (N,32)->(F,32) scatter-add with a
    # sort + vectorized reduction
    for mode in ("native", "sorted", "cumsum"):
        run(f"backward-gather-{mode}",
            ["scripts/bench_backward.py", mode])
    run("gather", ["scripts/bench_gather.py"])
    run("remat-ab", ["scripts/bench_remat_ab.py"])
    run("bench", ["bench.py"])
    run("renderD", ["scripts/bench_renderD.py"])
    run("emfirst", ["scripts/bench_emfirst_parts.py"])
    for stage in ("cam", "nee", "full"):
        run(f"stage-{stage}", ["scripts/bench_e2e_stages.py", stage])
    run("guiding-scale", ["scripts/bench_guiding_scale.py"])


if __name__ == "__main__":
    main()
