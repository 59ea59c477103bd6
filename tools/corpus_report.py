#!/usr/bin/env python
"""Render results/ corpus metrics into a results.md-style markdown table
(reference anchor: /root/reference/results.md, full_eval.py:62-112).

Usage: python tools/corpus_report.py [results_dir] >> DEVNOTES.md
"""

import json
import os
import sys

ABLATIONS = {
    "spheres": "defaults (round-3 anchor scene)",
    "thicket": "--antialiasing + depth loss from exact inv-depth GT",
    "glossy": "exposure-jittered train views + --train_test_exp recovery",
}


def main():
    rdir = sys.argv[1] if len(sys.argv) > 1 else "results"
    rows = []
    for name in ("spheres", "thicket", "glossy"):
        path = os.path.join(rdir, f"{name}_results.json")
        if not os.path.exists(path):
            rows.append((name, None))
            continue
        with open(path) as f:
            rows.append((name, json.load(f)))

    print("| scene | ablation | iters | PSNR | SSIM | LPIPS |")
    print("|---|---|---|---|---|---|")
    for name, res in rows:
        if res is None:
            print(f"| {name} | {ABLATIONS[name]} | — | (missing) | | |")
            continue
        for method, metrics in sorted(res.items()):
            it = method.split("_")[-1]
            psnr = metrics.get("PSNR")
            ssim = metrics.get("SSIM")
            lpips = metrics.get("LPIPS")
            fmt = lambda v: "null" if v is None else f"{v:.3f}"
            print(
                f"| {name} | {ABLATIONS[name]} | {it} | "
                f"{fmt(psnr)} | {fmt(ssim)} | {fmt(lpips)} |"
            )


if __name__ == "__main__":
    main()
