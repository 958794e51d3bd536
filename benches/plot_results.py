"""Render the SpGEMM sweep results as comparison plots (PNG).

The reference's sprs-benches emits plotters PNGs of wall-clock vs
density/shape (sprs-benches/src/main.rs:316+); this is the equivalent
over our results JSON.  Two fixed colorblind-safe hues (Okabe-Ito blue
for scipy-host, vermillion for sprs_tpu), single log-log axis per
panel, direct end-labels.

Usage: python benches/plot_results.py [results.json] [out.png]
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

BLUE = "#0072B2"  # scipy (host CPU)
VERMILLION = "#D55E00"  # sprs_tpu ESC (device)
GREEN = "#009E73"  # sprs_tpu densified-MXU (device)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "benches/results_spgemm_tpu_r1.json"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else (
        "benches/results_spgemm_tpu_r1.png"
    )
    with open(path) as f:
        data = json.load(f)

    panels = [
        ("density_sweep", "density sweep (1500×2500 and 15000×25000)"),
        ("shape_sweep", "square shape sweep (nnz/row ≈ 4)"),
    ]
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2))
    for ax, (key, title) in zip(axes, panels):
        rows = [
            r
            for r in data.get(key, [])
            if "scipy_s" in r
            and ("sprs_tpu_s" in r or r.get("dense_mxu_s"))
        ]
        if not rows:
            ax.set_axis_off()
            continue
        work = [
            max(r["nnz_a"] + r["nnz_b"] + r.get("nnz_c", 0), 1)
            for r in rows
        ]
        order = sorted(range(len(rows)), key=lambda i: work[i])
        w = [work[i] for i in order]
        sc = [rows[i]["scipy_s"] * 1e3 for i in order]
        ax.loglog(w, sc, "o-", color=BLUE, lw=2, ms=5, label="scipy (host)")
        esc = [
            (i, rows[i]["sprs_tpu_s"] * 1e3)
            for i in order
            if rows[i].get("sprs_tpu_s")
        ]
        if esc:
            ax.loglog(
                [work[i] for i, _ in esc],
                [t for _, t in esc],
                "s-",
                color=VERMILLION,
                lw=2,
                ms=5,
                label="sprs_tpu ESC (1 chip)",
            )
        dn = [
            (i, rows[i]["dense_mxu_s"] * 1e3)
            for i in order
            if rows[i].get("dense_mxu_s")
        ]
        if dn:
            ax.loglog(
                [work[i] for i, _ in dn],
                [t for _, t in dn],
                "^-",
                color=GREEN,
                lw=2,
                ms=5,
                label="sprs_tpu dense-MXU",
            )
        ax.set_xlabel("problem work  (nnz A + nnz B + nnz C)")
        ax.set_ylabel("wall time per multiply  [ms]")
        ax.set_title(title, fontsize=10)
        ax.grid(True, which="both", alpha=0.25, lw=0.5)
        ax.legend(frameon=False, fontsize=9)
    backend = data.get("backend") or "tpu"
    fig.suptitle(
        f"SpGEMM: sprs_tpu ({backend}) vs scipy.sparse — chained "
        "timing, results equality-asserted",
        fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
