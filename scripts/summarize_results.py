"""Render markdown tables + dataset averages from the sweep JSONLs.

Usage: python scripts/summarize_results.py results/kodak50k_cn_r3.jsonl \
           [results/kodak_quant50k_cn_r3.jsonl ...]
"""
import json
import sys
from pathlib import Path


def summarize(path: Path):
    recs = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    if not recs:
        print(f"{path}: empty")
        return
    keys = [k for k in ("psnr", "ms_ssim", "bpp", "bpp_wc", "bpp_stream",
                        "stream_psnr", "num_points", "wall")
            if k in recs[0]]
    print(f"\n## {path.name} ({len(recs)} images)\n")
    print("| image | " + " | ".join(keys) + " |")
    print("|---" * (len(keys) + 1) + "|")
    for r in recs:
        cells = [f"{r[k]:.4f}" if isinstance(r[k], float) else str(r[k])
                 for k in keys]
        print(f"| {r['image']} | " + " | ".join(cells) + " |")
    avg = ["**avg**"]
    for k in keys:
        vals = [r[k] for r in recs if k in r]
        avg.append(f"**{sum(vals)/len(vals):.4f}**")
    print("| " + " | ".join(avg) + " |")


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        summarize(Path(arg))
