"""Render results/true_step_time.jsonl as a markdown digest.

One row per measurement (single-case slope or interleaved A/B verdict),
newest last, so BASELINE.md tables can be regenerated instead of
hand-maintained. A/B rows get a verdict column from the pairwise sign
count; when the same case/AB was re-measured, every run is kept (the
jsonl is append-only) and the digest marks all but the last as
'superseded'.

Usage: python scripts/summarize_slopes.py [--out results/slope_digest.md]
"""

from __future__ import annotations

import argparse
import json

# Cases re-measured in a DIFFERENT artifact (the append-only source file
# never sees the newer run, so the last-wins rule above can't catch it).
# The round-3 tall-axis rows below used a narrow K-spread (k2-k1 = 32)
# whose slope signal is dominated by dispatch jitter at sub-ms steps;
# the round-4 re-measurement (k2-k1 = 512, results/timescale_slope.jsonl)
# is the current number — BASELINE.md's timescaling table quotes it.
CROSS_FILE_SUPERSEDED = {
    "timescale_tall_h128": "superseded by results/timescale_slope.jsonl",
    "timescale_tall_h512": "superseded by results/timescale_slope.jsonl",
    "timescale_tall_h2048": "superseded by results/timescale_slope.jsonl",
    "timescale_s16": "superseded by results/timescale_slope.jsonl",
    "timescale_s32": "superseded by results/timescale_slope.jsonl",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="results/true_step_time.jsonl")
    ap.add_argument("--out", default="results/slope_digest.md")
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.src) if l.strip()]
    last_idx = {}
    for i, r in enumerate(rows):
        key = tuple(r["ab"]) if "ab" in r else r.get("case")
        last_idx[key] = i

    out = ["# Slope-measurement digest (generated)\n",
           f"Source: `{args.src}` — {len(rows)} rows. "
           "Per-step times are same-session pairwise slopes "
           "(BASELINE.md 'Measurement methodology').\n"]

    out.append("## Single-case rows\n")
    out.append("| case | ms/step (median) | img/s | batch | trials |"
               " note |\n|---|---|---|---|---|---|")
    for i, r in enumerate(rows):
        if "ab" in r:
            continue
        if last_idx[r.get("case")] != i:
            note = "superseded"
        else:
            note = CROSS_FILE_SUPERSEDED.get(r.get("case"), "")
        out.append(
            f"| {r['case']} | {r['ms_per_step_median']} | "
            f"{r.get('images_per_sec', '—')} | {r.get('batch', '—')} | "
            f"{r['trials']} | {note} |")

    out.append("\n## A/B verdict rows\n")
    out.append("| A | B | A ms | B ms | A/B | B wins | verdict |\n"
               "|---|---|---|---|---|---|---|")
    for i, r in enumerate(rows):
        if "ab" not in r:
            continue
        a, b = r["ab"]
        wins, n = r["b_wins_of"]
        if last_idx[tuple(r["ab"])] != i:
            verdict = "superseded"
        elif wins == n:
            verdict = f"B wins {r['ratio_a_over_b_median']}x"
        elif wins == 0:
            verdict = f"A wins {round(1 / r['ratio_a_over_b_median'], 4)}x"
        else:
            verdict = "inconclusive"
        out.append(
            f"| {a} | {b} | {r['ms_per_step_a_median']} | "
            f"{r['ms_per_step_b_median']} | "
            f"{r['ratio_a_over_b_median']} | {wins}/{n} | {verdict} |")

    text = "\n".join(out) + "\n"
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
