"""One-shot TPU measurement battery for the round-2 debt list.

The axon tunnel has multi-hour outages (BASELINE.md measurement-debt
note); when it comes back the window may be short.  This orchestrator
captures EVERYTHING pending in one strictly-sequential pass:

  1. tunnel gate: tiny transfer + trivial-op health chain in a fresh
     subprocess; retries with sleeps until healthy or budget exhausted
  2. bench.py                      -> benches/results_r2/bench.json
  3. ldl_bench (256 sup / 128 scan)-> benches/results_r2/ldl_256.json
  4. r2 sort/stage-split exps      -> benches/results_r2/sortexp.log
  5. spgemm sweep                  -> benches/results_spgemm_tpu_r2.json
  6. 140M-product chunked + dense  -> benches/results_r2/chunked140.log
  7. spmv dispatch-floor battery   -> benches/results_r2/spmv_battery.log

Every stage is a fresh subprocess (the worker crashes after too many
distinct executables in one process — see CLAUDE.md), run one at a
time (two jax processes deadlock on the tunnel), with a hard timeout
and a recovery sleep after failures (killed TPU processes wedge the
tunnel; the gate re-probes before the next stage).

Usage:  python benches/run_all_tpu.py [--budget-min 150] [--skip ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benches", "results_r4")

GATE_SRC = r"""
import time, sys
t00 = time.time()
import numpy as np, jax, jax.numpy as jnp
try:
    jax.devices()
except RuntimeError as e:
    print(f"GATE DOWN init: {e}", flush=True); sys.exit(2)
if jax.default_backend() != "tpu":
    print(f"GATE DOWN backend={jax.default_backend()}", flush=True); sys.exit(2)
t0 = time.time()
z = jnp.asarray(np.ones(262144, np.float32))
v = float(np.asarray(z[7]))
print(f"gate 1MB transfer {time.time()-t0:.1f}s", flush=True)
x = jnp.asarray(np.random.default_rng(0).random(1 << 21).astype(np.float32))
f = jax.jit(lambda v: v * 1.000001 + 0.5)
y = f(x); _ = float(np.asarray(y[0]))
best = 1e9
for r in range(3):
    t0 = time.time(); y = x
    for _ in range(10):
        y = f(y)
    _ = float(np.asarray(y[0]))
    best = min(best, (time.time() - t0) / 10)
print(f"gate trivial 8MB chain {best*1e3:.2f} ms/iter", flush=True)
# healthy: well under 1 ms; degraded states reach 60+ ms.  Use 5 ms
# as the go/no-go bar (2-4x process-to-process swing is normal).
sys.exit(0 if best < 5e-3 else 3)
"""


def run(cmd, timeout, log_path, env=None):
    print(f"== {' '.join(cmd)} (timeout {timeout}s)", flush=True)
    t0 = time.time()
    if env is None:
        env = os.environ.copy()
        # benches/*.py import sprs_tpu: `python benches/foo.py` puts
        # benches/ (not the repo root) on sys.path — put it there
        # explicitly (APPEND to any existing path, e.g. the axon site).
        env["PYTHONPATH"] = REPO + (
            ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
    with open(log_path, "ab") as lf:
        lf.write(f"\n==== {time.strftime('%H:%M:%S')} {cmd}\n".encode())
        lf.flush()
        try:
            p = subprocess.run(
                cmd,
                stdout=lf,
                stderr=subprocess.STDOUT,
                timeout=timeout,
                env=env,
                cwd=REPO,
            )
            rc = p.returncode
        except subprocess.TimeoutExpired:
            rc = -9
    print(f"   rc={rc} in {time.time()-t0:.0f}s -> {log_path}", flush=True)
    return rc


def gate(budget_deadline, log):
    """Probe until the tunnel is up and healthy; False if budget gone."""
    attempt = 0
    while time.time() < budget_deadline:
        attempt += 1
        rc = run(
            [sys.executable, "-u", "-c", GATE_SRC],
            timeout=420,
            log_path=log,
        )
        if rc == 0:
            return True
        # init-down probes exit fast; hangs/timeouts may have wedged
        # the tunnel — give it a recovery pause either way.
        time.sleep(60 if rc in (2, 3) else 240)
    return False


def import_smoke(log):
    """Fail fast on environment problems (round-2 burned a hardware
    window on a PYTHONPATH-induced ModuleNotFoundError): import
    sprs_tpu + the bench modules on pure CPU in a subprocess with the
    SAME env the stages get."""
    src = "import sprs_tpu, sprs_tpu.linalg.ldl_batched; print('IMPORT OK')"
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    rc = run(
        [sys.executable, "-c", src], timeout=180, log_path=log, env=env
    )
    return rc == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-min", type=float, default=150.0)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument(
        "--force",
        nargs="*",
        default=[],
        help="re-run these stages even if a previous run completed them "
        "('all' forces everything)",
    )
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    deadline = time.time() + args.budget_min * 60
    gatelog = os.path.join(OUT, "gate.log")
    summary_path = os.path.join(OUT, "summary.json")
    py = sys.executable

    stages = [
        # (name, cmd, timeout_s) — SpGEMM stages FIRST (round-4 verdict:
        # they lost the budget race two rounds running)
        (
            "spgemm_sweep",
            [
                py, "-u", "benches/spgemm_bench.py",
                "--out", "benches/results_spgemm_tpu_r4.json",
            ],
            5400,
        ),
        ("chunked140", [py, "-u", "benches/r2/r2_chunked140.py"], 2400),
        (
            "spgemm_heavy",
            [
                py, "-u", "benches/spgemm_bench.py", "--retry-errors",
                "--out", "benches/results_spgemm_tpu_r4.json",
            ],
            7200,
        ),
        ("bench", [py, "-u", "bench.py"], 1800),
        ("spmv_battery", [py, "-u", "benches/r2/r2_spmv_battery.py"], 1800),
        ("sortexp", [py, "-u", "benches/r2/r2_sortexp.py"], 1800),
        (
            "ldl256_nd",
            [
                py, "-u", "benches/ldl_bench.py",
                "--grid", "256", "--fill", "nd",
                "--rel-zeros", "0.85", "--scan-iters", "0", "--skip-seq",
                "--json", os.path.join(OUT, "ldl_256_nd.json"),
            ],
            2400,
        ),
        (
            "ldl512",
            [
                py, "-u", "benches/ldl_big.py",
                "--grid", "512", "--fill", "nd", "--kind", "mf",
                "--json", os.path.join(OUT, "ldl_512.json"),
            ],
            3000,
        ),
        (
            "ldl1024",
            [
                py, "-u", "benches/ldl_big.py",
                "--grid", "1024", "--fill", "nd", "--kind", "super",
                "--iters", "2", "--no-flat",
                "--json", os.path.join(OUT, "ldl_1024.json"),
            ],
            4800,
        ),
        # round-4 follow-ups (resume skips completed stages above)
        ("extra_points", [py, "-u", "benches/r4/r4_extra_points.py"], 3600),
        (
            "ldl_phase_r4",
            [
                py, "-u", "benches/r4/r4_ldl_phase.py",
                "--grid", "256", "--fill", "nd",
                "--json", os.path.join(OUT, "ldl_phase_r4.json"),
            ],
            2400,
        ),
        (
            "dense_prec",
            [
                py, "-u", "benches/r4/r4_dense_prec.py",
                "--json", os.path.join(OUT, "dense_prec.json"),
            ],
            2400,
        ),
    ]

    # stage-level resume: reload the previous summary; completed stages
    # (rc=0) are skipped unless forced
    results = {}
    if os.path.exists(summary_path):
        try:
            results = json.load(open(summary_path))
        except Exception:
            results = {}

    def flush_summary():
        with open(summary_path, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")

    if not import_smoke(gatelog):
        print("IMPORT SMOKE FAILED — aborting before any gate probe")
        results["_import_smoke"] = "failed"
        flush_summary()
        sys.exit(1)

    for name, cmd, tmo in stages:
        if name in args.skip:
            results.setdefault(name, "skipped")
            flush_summary()
            continue
        if results.get(name) == "rc=0" and not (
            name in args.force or "all" in args.force
        ):
            print(f"== {name}: already completed (resume) — skipping")
            continue
        if time.time() > deadline:
            results[name] = "budget_exhausted"
            flush_summary()
            continue
        if not gate(deadline, gatelog):
            results[name] = "tunnel_down"
            flush_summary()
            continue
        log = os.path.join(OUT, f"{name}.log")
        rc = run(cmd, min(tmo, max(deadline - time.time(), 60)), log)
        results[name] = f"rc={rc}"
        flush_summary()
        if rc != 0:
            # a killed/crashed TPU process can wedge the tunnel for the
            # next large transfer — rest before the next gate probe
            time.sleep(120)
    # bench.py prints its JSON line to stdout (captured in the log);
    # copy the last JSON line out for convenience.
    blog = os.path.join(OUT, "bench.log")
    if os.path.exists(blog):
        lines = [
            ln
            for ln in open(blog, errors="replace").read().splitlines()
            if ln.startswith("{")
        ]
        if lines:
            with open(os.path.join(OUT, "bench.json"), "w") as f:
                f.write(lines[-1] + "\n")
    flush_summary()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
