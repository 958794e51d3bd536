"""Merge `spgemm_bench.py --one`-style JSON lines into a results file.

The round-4 sweep lost the shape-sweep points to the stage timeout;
this fills them in from a manual run without redoing the 12 completed
density points (the bench has stage-level resume only).

Usage:
    python benches/spgemm_bench.py --one '[{...}, ...]' > points.jsonl
    python benches/r4/merge_points.py results_spgemm_tpu_r4.json \
        points.jsonl shape_sweep
"""

import json
import sys


def main():
    res_path, pts_path, key = sys.argv[1], sys.argv[2], sys.argv[3]
    results = json.load(open(res_path))
    rows = results.setdefault(key, [])
    added = 0
    for ln in open(pts_path):
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        pt = json.loads(ln)
        sig = (pt.get("shape_a"), pt.get("shape_b"), pt.get("density"))
        for i, row in enumerate(rows):
            if (
                row.get("shape_a"),
                row.get("shape_b"),
                row.get("density"),
            ) == sig:
                rows[i] = pt
                break
        else:
            rows.append(pt)
        added += 1
    with open(res_path, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"merged {added} points into {res_path}:{key}")


if __name__ == "__main__":
    main()
