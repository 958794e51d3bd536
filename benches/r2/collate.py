"""Collate benches/results_r2/ into a BASELINE.md-ready summary.

Usage: python benches/r2/collate.py  (prints markdown rows + raw JSON)
"""

from __future__ import annotations

import json
import os
import re

OUT = os.path.join(os.path.dirname(__file__), "..", "results_r2")


def last_json_line(path):
    try:
        lines = [
            ln
            for ln in open(path, errors="replace").read().splitlines()
            if ln.startswith("{")
        ]
        return json.loads(lines[-1]) if lines else None
    except Exception:
        return None


def grep(path, pat):
    try:
        return re.findall(pat, open(path, errors="replace").read())
    except Exception:
        return []


def main():
    rows = []
    b = last_json_line(os.path.join(OUT, "bench.json")) or last_json_line(
        os.path.join(OUT, "bench.log")
    )
    if b:
        d = b.get("detail", {})
        rows.append(
            f"| SpMV roofline | frac {b['value']} of copy "
            f"({d.get('spmv_effective_GBps')} GB/s vs copy "
            f"{d.get('copy_peak_GBps')}, twin {d.get('stream_twin_GBps')} "
            f"-> frac_vs_twin {d.get('frac_vs_stream_twin')}) | "
            f"{d.get('kernel')} | backend {d.get('backend')} |"
        )
    for name in ("ldl_256.json", "ldl_256_camd.json"):
        j = last_json_line(os.path.join(OUT, name))
        if j:
            rows.append(
                f"| LDL {j.get('fill')} grid {j.get('grid')} | "
                f"supernodal {1e3*j.get('supernodal_s', 0):.1f} ms "
                f"({j.get('supernodal_gflops')} GF/s), solve super "
                f"{1e3*(j.get('solve_super_s') or 0):.2f} ms vs levels "
                f"{1e3*(j.get('solve_levels_s') or 0):.2f} ms | "
                f"speedup/flop {j.get('speedup_per_flop', '-')} | "
                f"lnz {j.get('lnz')} |"
            )
    for m in grep(
        os.path.join(OUT, "chunked140.log"),
        r"(tpu (?:chunked|dense-mxu) trial \d+: [\d.]+ s  ratio vs scipy [\d.]+x)",
    ):
        rows.append(f"| 140M products | {m} | | |")
    for m in grep(
        os.path.join(OUT, "chunked140.log"), r"(scipy best-of-3: [\d.]+ s)"
    ):
        rows.append(f"| 140M products | {m} | | |")
    sw = last_json_line(
        os.path.join(OUT, "..", "results_spgemm_tpu_r2.json")
    )
    if sw:
        best = []
        for r in sw.get("density_sweep", []) + sw.get("shape_sweep", []):
            s1 = r.get("fori_speedup_vs_scipy") or r.get(
                "speedup_vs_scipy"
            )
            s2 = r.get("dense_fori_speedup_vs_scipy") or r.get(
                "dense_speedup_vs_scipy"
            )
            cand = max(
                [x for x in (s1, s2) if x is not None], default=None
            )
            if cand:
                best.append(
                    (cand, r["shape_a"], r["density"], s1, s2)
                )
        for cand, sh, dn, s1, s2 in sorted(best, reverse=True)[:6]:
            rows.append(
                f"| SpGEMM {sh}@{dn:g} | best {cand:.2f}x scipy "
                f"(esc {s1 if s1 else '-'}, dense {s2 if s2 else '-'}) | | |"
            )
    print("| Metric | Measured | Kernel | Note |")
    print("|---|---|---|---|")
    for r in rows:
        print(r)
    summ = last_json_line(os.path.join(OUT, "summary.json"))
    if summ:
        print("\nstage status:", json.dumps(summ))


if __name__ == "__main__":
    main()
